#!/usr/bin/env python
"""Walking-shape study for the Moussaid-2010 group model.

The paper's empirical finding (Moussaid, Perozo, Garnier, Helbing &
Theraulaz 2010, PLoS ONE 5(4):e10047, Fig. 2): at low density a walking
party spreads laterally into a line abreast; as density rises the line
bends -- the paper's pedestrians form a concave "V"/"U" (center member
slightly BEHIND the flanks) so everyone keeps the others in view.

This tool measures the emergent shape of 3-member parties embedded in a
pre-mixed counterflow corridor (the tests/test_physics.py geometry) at
three densities, in the walking frame:

* lateral width  w     = y_max - y_min over the members,
* bend           delta = x_center - mean(x_flanks)   (x = walking axis,
  "center" = the member with the middle lateral position; delta < 0 =
  center behind = the paper's concave V),
* cohesion       r_max = max pairwise member distance.

Multiple parties per run x multiple seeds; the stable part of the result
is pinned in tests/test_physics.py.

Run:  python tools/group_shape_study.py   (CPU, ~2 min)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
except Exception:
    pass

import dataclasses  # noqa: E402

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from carla_social_force_model_tpu.env.borders import build_border_set  # noqa: E402
from carla_social_force_model_tpu.models import modes  # noqa: E402
from carla_social_force_model_tpu.models.groups import build_groups  # noqa: E402
from carla_social_force_model_tpu.models.params import SfmParams  # noqa: E402
from carla_social_force_model_tpu.models.routes import RouteBuffer  # noqa: E402
from carla_social_force_model_tpu.models.spawn import SpawnSchedule  # noqa: E402
from carla_social_force_model_tpu.models.state import PedState  # noqa: E402
from carla_social_force_model_tpu.models.stepper import (Scene, StepConfig,  # noqa: E402
                                                         make_rollout_fn)

LENGTH, WIDTH = 120.0, 6.0
N_PARTIES = 4
STEPS = 600


def grouped_corridor(n, seed, group_force=True):
    """Counterflow corridor with ``N_PARTIES`` eastbound 3-member parties
    embedded in an n-strong pre-mixed bidirectional crowd."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-LENGTH / 2, LENGTH / 2, n)
    y = rng.uniform(-WIDTH / 2 + 0.4, WIDTH / 2 - 0.4, n)
    dirs = np.where(np.arange(n) % 2 == 0, 1.0, -1.0)
    gid = np.full(n, -1, np.int32)
    # parties: first N_PARTIES*3 even slots re-placed side by side, east
    for p in range(N_PARTIES):
        slots = np.array([6 * p, 6 * p + 2, 6 * p + 4])
        gid[slots] = p
        dirs[slots] = 1.0
        x0 = -LENGTH / 2 + 8.0 + p * (LENGTH - 30.0) / N_PARTIES
        x[slots] = x0 + rng.normal(0, 0.1, 3)
        y[slots] = np.array([-0.8, 0.0, 0.8]) + rng.normal(0, 0.05, 3)
    dest_x = dirs * 900.0
    speeds = np.full(n, 1.3) + rng.uniform(-0.1, 0.1, n)
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
    m = int(2 * LENGTH / 0.1)
    walls = [np.column_stack([np.linspace(-LENGTH, LENGTH, m),
                              np.full(m, WIDTH / 2)]),
             np.column_stack([np.linspace(-LENGTH, LENGTH, m),
                              np.full(m, -WIDTH / 2)])]
    borders = build_border_set(walls, [w[m // 2] for w in walls],
                               [2 * LENGTH, 2 * LENGTH])
    scene = Scene(spawn=sched, borders=borders, groups=build_groups(gid))
    params = SfmParams(enable_acceleration=True, enable_pedestrian=True,
                       enable_border=True, enable_group=group_force)
    cfg = StepConfig(dt=0.05, despawn_on_arrival=False, use_pallas=False)
    return scene, params, cfg, gid


def shapes(n, seed, group_force=True, warmup=120):
    """Per-party time-averaged (width, bend, r_max) over the steady window."""
    scene, params, cfg, gid = grouped_corridor(n, seed, group_force)
    _, rec = make_rollout_fn(scene, params, cfg, STEPS, record=True)(
        PedState.empty(scene.spawn.capacity))
    pos = np.asarray(rec.pos)
    out = []
    for p in range(N_PARTIES):
        slots = np.nonzero(gid == p)[0]
        widths, bends, rmaxs = [], [], []
        for t in range(warmup, pos.shape[0]):
            pts = pos[t, slots]
            if abs(pts[:, 0]).max() > LENGTH / 2 - 3.0:   # leaving corridor
                break
            order = np.argsort(pts[:, 1])
            lo, ce, hi = pts[order]
            widths.append(hi[1] - lo[1])
            bends.append(ce[0] - 0.5 * (lo[0] + hi[0]))
            rmaxs.append(max(np.linalg.norm(pts[i] - pts[j])
                             for i in range(3) for j in range(i + 1, 3)))
        if len(widths) >= 100:
            out.append((np.mean(widths), np.mean(bends), np.mean(rmaxs)))
    return out


def main():
    print(f"3-member parties in a {LENGTH:.0f}x{WIDTH:.0f} m counterflow "
          f"corridor (bend < 0 = center behind = concave V):")
    for n, tag in ((24, "free walking (parties only)"),
                   (320, "0.44 peds/m^2 counterflow  "),
                   (680, "0.94 peds/m^2 counterflow  ")):
        rows = []
        for seed in (3, 11, 23, 41):
            rows += shapes(n, seed)
        w, b, r = (np.mean([x[k] for x in rows]) for k in range(3))
        bs = np.asarray([x[1] for x in rows])
        print(f"  {tag} n={n:3d}: width {w:5.2f} m  bend {b:+6.3f} m "
              f"(sd {bs.std():.3f}, {sum(bs > 0)}/{len(bs)} parties > 0)  "
              f"cohesion {r:5.2f} m")
    print("\ncontrol (group force OFF, 0.44 peds/m^2):")
    rows = []
    for seed in (3, 11, 23, 41):
        rows += shapes(320, seed, group_force=False)
    if rows:
        r = np.mean([x[2] for x in rows])
        print(f"  cohesion {r:5.2f} m over {len(rows)} parties "
              f"(grouped-force parties above stay ~1.5 m)")
    else:
        print("  (all control parties dispersed past the corridor window)")


if __name__ == "__main__":
    main()
