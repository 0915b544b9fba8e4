"""Physics validation: the emergent crowd phenomena the Social Force Model
is known for must emerge from this implementation.

These are scientific-behavior regression tests, not parity tests: the
reference (and the Moussaid et al. 2009 / Helbing-Molnar 1995 literature
behind it, /root/reference/README.md:204-206) predicts lane formation in
bidirectional flow and the speed-density relation of the fundamental
diagram.  A numerics bug that preserves per-force parity tolerances but
breaks collective behavior (wrong evasion sign, broken angle wrap) shows
up here.
"""
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from carla_social_force_model_tpu.env.borders import build_border_set
from carla_social_force_model_tpu.models import modes
from carla_social_force_model_tpu.models.params import SfmParams
from carla_social_force_model_tpu.models.routes import RouteBuffer
from carla_social_force_model_tpu.models.spawn import SpawnSchedule
from carla_social_force_model_tpu.models.state import PedState
from carla_social_force_model_tpu.models.stepper import (Scene, StepConfig,
                                                         make_rollout_fn)

WIDTH = 6.0


def corridor_counterflow(n=320, length=120.0, width=WIDTH, seed=0):
    """Bidirectional corridor: alternating directions, mixed uniformly over
    the full length, walls at +-width/2 sampled at the reference's 0.1 m
    resolution.  Far goals keep everyone walking for the whole rollout."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-length / 2, length / 2, n)
    y = rng.uniform(-width / 2 + 0.4, width / 2 - 0.4, n)
    dirs = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    dest_x = dirs * 900.0
    speeds = np.full(n, 1.3) + rng.uniform(-0.15, 0.15, n)
    routes = RouteBuffer(wp_x=jnp.asarray(dest_x[:, None], jnp.float32),
                         wp_y=jnp.asarray(y[:, None], jnp.float32),
                         crossing=jnp.zeros((n, 1), bool),
                         count=jnp.ones((n,), jnp.int32))
    sched = SpawnSchedule(
        step=jnp.zeros((n,), jnp.int32),
        pos_x=jnp.asarray(x, jnp.float32), pos_y=jnp.asarray(y, jnp.float32),
        vel_x=jnp.asarray(dirs * speeds, jnp.float32),
        vel_y=jnp.zeros((n,), jnp.float32),
        speed=jnp.asarray(speeds, jnp.float32),
        crossing_speed=jnp.asarray(speeds * 1.5, jnp.float32),
        margin=jnp.full((n,), 1.5, jnp.float32),
        radius=jnp.full((n,), 0.3, jnp.float32),
        initial_mode=jnp.full((n,), modes.WALKING_SIDEWALK, jnp.int32),
        fwp_x=jnp.asarray(dest_x, jnp.float32),
        fwp_y=jnp.asarray(y, jnp.float32), routes=routes)
    m = int(2 * length / 0.1)
    walls = [np.column_stack([np.linspace(-length, length, m),
                              np.full(m, width / 2)]),
             np.column_stack([np.linspace(-length, length, m),
                              np.full(m, -width / 2)])]
    borders = build_border_set(walls, [w[m // 2] for w in walls],
                               [2 * length, 2 * length])
    scene = Scene(spawn=sched, borders=borders)
    params = SfmParams(enable_acceleration=True, enable_pedestrian=True,
                       enable_border=True)
    cfg = StepConfig(dt=0.05, despawn_on_arrival=False, use_pallas=False)
    return scene, params, cfg, PedState.empty(n), dirs


def band_index(pos, dirs, x_win=32.0, width=WIDTH, bins=8, slices=6):
    """Lane (band) order parameter -- the packaged
    utils.metrics.lane_order_parameter (its docstring has the definition),
    so the physics suite exercises the shipped implementation."""
    from carla_social_force_model_tpu.utils.metrics import (
        lane_order_parameter)
    y = lane_order_parameter(pos, dirs,
                             (-x_win, x_win, -width / 2, width / 2),
                             bins=bins, slices=slices)
    assert np.isfinite(y), "no populated x-slice"
    return y


def band_excess(pos, dirs, seed=1, shuffles=30, **kw):
    """Band index minus its shuffled-label null on the SAME positions (the
    raw index sits at ~1/k for k peds per bin, so 'lanes formed' must mean
    exceeding what random direction labels score on this geometry)."""
    rng = np.random.default_rng(seed)
    y = band_index(pos, dirs, **kw)
    null = float(np.mean([band_index(pos, rng.permutation(dirs), **kw)
                          for _ in range(shuffles)]))
    return y - null, y, null


def test_lane_formation_in_counterflow():
    """Bidirectional flow self-organizes into direction-segregated lanes
    (Moussaid 2009's headline collective effect): the band index must rise
    far above its shuffled null within 10-20 s (measured: excess ~+0.44
    from a ~+0.04 mixed baseline)."""
    scene, params, cfg, state, dirs = corridor_counterflow()
    run = make_rollout_fn(scene, params, cfg, 400)
    _, rec = run(state)
    pos = np.asarray(rec.pos)
    e0, y0, null0 = band_excess(pos[0], dirs)
    e20, y20, null20 = band_excess(pos[399], dirs)
    assert abs(e0) < 0.1, f"baseline not mixed: Y {y0} vs null {null0}"
    assert e20 > 0.25, (f"no lane formation: Y(20s) = {y20}, "
                        f"shuffled null = {null20}")


def test_lanes_need_the_interaction_force():
    """Control: with the pedestrian force disabled, the same corridor shows
    no lateral self-organization (band excess stays at the null), pinning
    lane formation on the interaction force rather than on geometry or
    transport."""
    scene, params, cfg, state, dirs = corridor_counterflow()
    params = dataclasses.replace(params, enable_pedestrian=False)
    run = make_rollout_fn(scene, params, cfg, 400)
    _, rec = run(state)
    pos = np.asarray(rec.pos)
    excess, y, null = band_excess(pos[399], dirs)
    assert abs(excess) < 0.1, (
        f"segregation without interactions: Y {y} vs null {null}")


def test_fundamental_diagram_speed_falls_with_density():
    """The fundamental diagram's qualitative core: mean walking speed in
    the interacting zone decreases monotonically as density rises, from
    near the free-flow target at low density."""
    mean_speeds = []
    for n in (80, 320, 640):
        scene, params, cfg, state, _ = corridor_counterflow(n=n)
        run = make_rollout_fn(scene, params, cfg, 300)
        _, rec = run(state)
        vel = np.asarray(rec.vel)[150:]          # past the initial transient
        pos = np.asarray(rec.pos)[150:]
        inside = np.abs(pos[..., 0]) < 32.0      # the interacting zone
        speed = np.sqrt((vel ** 2).sum(-1))
        mean_speeds.append(float(speed[inside].mean()))
    s_low, s_mid, s_high = mean_speeds
    assert s_low > s_mid > s_high, mean_speeds
    # free-flow speed at the lowest density stays near the 1.3 m/s target
    assert s_low > 1.1, mean_speeds
    # and congestion bites measurably at the highest density
    assert s_high < s_low - 0.05, mean_speeds


def test_group_cohesion_and_density_compression():
    """Moussaid-2010 social-group physics (models/groups.py), measured on
    parties embedded in the counterflow corridor (tools/group_shape_study):

    * cohesion: the group terms hold a 3-member party together through a
      0.44 peds/m^2 counterflow (max pairwise spread ~1.2 m) where the
      same party WITHOUT the group force disperses several-fold;
    * density compression (the paper's Fig. 2 signature): the party's
      lateral width shrinks as crowd density rises;
    * shape: the party walks essentially line-abreast -- the time-mean
      longitudinal bend stays small relative to the width.  (Study note:
      the 2010 gaze/attraction/repulsion terms alone give a SLIGHT
      center-ahead bend here; the paper's concave-V sign did not emerge
      at the tested densities.)
    """
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    from group_shape_study import shapes

    free = shapes(24, seed=3) + shapes(24, seed=11)
    crowd = shapes(320, seed=3) + shapes(320, seed=11)
    loose = shapes(320, seed=3, group_force=False)
    assert len(free) >= 6 and len(crowd) >= 6 and len(loose) >= 3

    crowd_r = np.mean([r for _, _, r in crowd])
    loose_r = np.mean([r for _, _, r in loose])
    assert crowd_r < 1.8, f"grouped party spread {crowd_r} m"
    assert loose_r > 2.0 * crowd_r, (crowd_r, loose_r)

    free_w = np.mean([w for w, _, _ in free])
    crowd_w = np.mean([w for w, _, _ in crowd])
    assert crowd_w < free_w - 0.1, (free_w, crowd_w)

    for rows in (free, crowd):
        w = np.mean([x[0] for x in rows])
        b = np.mean([x[1] for x in rows])
        assert abs(b) < 0.3 * w, (b, w)
