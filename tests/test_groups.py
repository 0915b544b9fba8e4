"""Moussaid-2010 social-group forces (models/groups.py) vs the f64 oracle.

A beyond-reference model capability (the reference implements only the 2009
individual forces); enabled by ``[forces] group_force`` + ``group_size`` on
a ``[[walker.ped_spawner]]``.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import oracle
from carla_social_force_model_tpu.models.groups import (GroupSet, build_groups,
                                                        group_force)
from carla_social_force_model_tpu.models.params import GroupParams, SfmParams

RNG = np.random.default_rng(42)


def _random_state(n=40, n_groups=6, seed=0, extent=6.0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-extent, extent, (n, 2)).astype(np.float32)
    vel = rng.uniform(-1.5, 1.5, (n, 2)).astype(np.float32)
    desired = rng.normal(size=(n, 2))
    desired /= np.linalg.norm(desired, axis=-1, keepdims=True)
    desired = desired.astype(np.float32)
    alive = rng.uniform(size=n) < 0.85
    # group sizes 2-5, some slots ungrouped (-1)
    gid = np.full(n, -1, np.int32)
    slot = 0
    for g in range(n_groups):
        size = int(rng.integers(2, 6))
        gid[slot: slot + size] = g
        slot += size + int(rng.integers(0, 3))   # gaps of ungrouped slots
        if slot >= n:
            break
    # cluster group members so the repulsion/attraction gates both fire
    for g in range(n_groups):
        m = gid == g
        if m.sum() >= 2:
            anchor = pos[np.nonzero(m)[0][0]]
            pos[m] = anchor + rng.uniform(-1.2, 1.2,
                                          (m.sum(), 2)).astype(np.float32)
    return pos, vel, desired, alive, gid


def _call(pos, vel, desired, alive, groups, p, **kw):
    return group_force(
        jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
        jnp.asarray(vel[:, 0]), jnp.asarray(vel[:, 1]),
        jnp.asarray(desired[:, 0]), jnp.asarray(desired[:, 1]),
        jnp.asarray(alive), groups, p, **kw)


def test_group_force_matches_oracle():
    pos, vel, desired, alive, gid = _random_state()
    groups = build_groups(gid)
    p = GroupParams()
    fx, fy = _call(pos, vel, desired, alive, groups, p)
    got = np.stack([np.asarray(fx), np.asarray(fy)], axis=-1)
    want = oracle.group_force(pos.astype(np.float64), vel.astype(np.float64),
                              desired.astype(np.float64), alive, gid)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
    # ungrouped and dead slots feel exactly nothing
    zero = (gid < 0) | ~alive
    assert np.all(got[zero] == 0.0)


def test_group_force_gates():
    p = GroupParams()
    e = np.asarray([[1.0, 0.0]] * 2, np.float32)
    groups = build_groups(np.asarray([0, 0]))
    # far apart (beyond (M-1)/2 = 0.5 m): attraction pulls together
    pos = np.asarray([[0.0, 0.0], [3.0, 0.0]], np.float32)
    vel = np.zeros((2, 2), np.float32)
    fx, fy = _call(pos, vel, e, np.ones(2, bool), groups, p)
    fx = np.asarray(fx)
    assert fx[0] > 0 and fx[1] < 0
    # too close (under rep_distance): repulsion pushes apart
    pos = np.asarray([[0.0, 0.0], [0.3, 0.0]], np.float32)
    fx, fy = _call(pos, vel, e, np.ones(2, bool), groups, p)
    fx = np.asarray(fx)
    assert fx[0] < 0 and fx[1] > 0
    # gaze: partner abreast (90 degrees off the gaze direction) damps a
    # moving member; partner straight ahead does not
    pos = np.asarray([[0.0, 0.0], [0.0, 2.0]], np.float32)
    vel = np.asarray([[1.3, 0.0], [1.3, 0.0]], np.float32)
    fx, fy = _call(pos, vel, e, np.ones(2, bool), groups, p)
    assert np.asarray(fx)[0] < 0          # slows down to keep sight
    pos = np.asarray([[0.0, 0.0], [2.0, 0.0]], np.float32)
    fx2, _ = _call(pos, vel, e, np.ones(2, bool), groups, p)
    # partner straight ahead: alpha = 0 (no gaze damping), pure attraction
    # pulling the trailing member forward
    assert abs(np.asarray(fx2)[0] - p.beta_att) < 1e-5


def test_single_survivor_group_is_inert():
    p = GroupParams()
    groups = build_groups(np.asarray([0, 0]))
    pos = np.asarray([[0.0, 0.0], [0.2, 0.0]], np.float32)
    vel = np.ones((2, 2), np.float32)
    e = np.asarray([[1.0, 0.0]] * 2, np.float32)
    alive = np.asarray([True, False])
    fx, fy = _call(pos, vel, e, alive, groups, p)
    assert np.all(np.asarray(fx) == 0.0) and np.all(np.asarray(fy) == 0.0)


def test_build_groups_validation():
    assert build_groups(np.full(5, -1)) is None
    g = build_groups(np.asarray([3, 3, -1, 7, 7, 7]))
    assert g.n_groups == 2
    assert sorted(np.asarray(g.member_slot[0])[:2].tolist()) == [0, 1]
    with pytest.raises(ValueError, match="max_members"):
        build_groups(np.zeros(9, np.int32), max_members=8)


def test_group_force_sharded_matches_single():
    from jax.sharding import Mesh, PartitionSpec as P
    pos, vel, desired, alive, gid = _random_state(n=64, seed=5)
    groups = build_groups(gid)
    p = GroupParams()
    fx, fy = _call(pos, vel, desired, alive, groups, p)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("agents",))
    fn = jax.jit(jax.shard_map(
        lambda *a: group_force(*a, groups, p, axis_name="agents"),
        mesh=mesh, in_specs=(P("agents"),) * 7,
        out_specs=(P("agents"),) * 2, check_vma=False))
    sfx, sfy = fn(jnp.asarray(pos[:, 0]), jnp.asarray(pos[:, 1]),
                  jnp.asarray(vel[:, 0]), jnp.asarray(vel[:, 1]),
                  jnp.asarray(desired[:, 0]), jnp.asarray(desired[:, 1]),
                  jnp.asarray(alive))
    np.testing.assert_allclose(np.asarray(sfx), np.asarray(fx), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sfy), np.asarray(fy), atol=1e-5)


def test_group_scenario_end_to_end():
    """group_size on a spawner + [forces] group_force: a 3-member group
    stays together while an ungrouped control crowd spreads."""
    from carla_social_force_model_tpu.api.scenario import build_scenario
    from carla_social_force_model_tpu.api.simulation import Simulation
    scenario = {
        "step_length": 0.05,
        "walker": {"despawn_on_arrival": False, "waypoint_threshold": 1,
                   "variate_speed": 0.25, "pedestrian_seed": 9,
                   "ped_spawner": [
                       {"spawn_location": [-8.0, 0.0, 1.0],
                        "destination": [60.0, 0.0, 0.0], "speed": 1.3,
                        "quantity": 3, "spawn_interval": 0.3,
                        "group_size": 3}]},
    }
    sfm = {"forces": {"acceleration_force": True, "pedestrian_force": True,
                      "group_force": True},
           "group_force": {"beta_att": 3.0}}
    steps = 300
    b = build_scenario(scenario, sfm, steps)
    assert b.scene.groups is not None and b.scene.groups.n_groups == 1
    _, rec = Simulation(b).run()
    pos = np.asarray(rec.pos)

    sfm_off = {"forces": {"acceleration_force": True,
                          "pedestrian_force": True}}
    b0 = build_scenario(scenario, sfm_off, steps)
    # group STRUCTURE is still built from group_size; only the force is off
    assert b0.scene.groups is not None and not b0.params.enable_group
    _, rec0 = Simulation(b0).run()
    pos0 = np.asarray(rec0.pos)

    def spread(p):
        # mean pairwise distance among the 3 members at the last frame
        last = p[-1]
        return np.mean([np.linalg.norm(last[i] - last[j])
                        for i in range(3) for j in range(i + 1, 3)])

    assert np.isfinite(pos).all()
    # speed jitter makes ungrouped members drift apart over 15 s; the
    # group attraction holds the party inside its coherence length
    assert spread(pos) < spread(pos0) * 0.7, (spread(pos), spread(pos0))
    assert spread(pos) < 2.0, spread(pos)


def test_strict_parity_rejects_group_force():
    cfg = {"forces": {"group_force": True}}
    with pytest.raises(ValueError, match="group_force"):
        SfmParams.from_dict(cfg, strict_parity=True)
    params = SfmParams.from_dict({"forces": {"group_force": True},
                                  "group_force": {"beta_vis": 5.0}})
    assert params.enable_group and params.group.beta_vis == 5.0


def test_group_params_calibratable():
    """group.beta_att is recoverable by gradient descent through the
    rollout (api/calibrate.py generic dotted-path machinery)."""
    from carla_social_force_model_tpu.api.calibrate import (
        fit_params, get_param, replace_params)
    from carla_social_force_model_tpu.api.scenario import build_scenario
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn
    scenario = {
        "step_length": 0.05,
        "walker": {"despawn_on_arrival": False, "waypoint_threshold": 1,
                   "variate_speed": 0.3, "pedestrian_seed": 4,
                   "ped_spawner": [
                       {"spawn_location": [-6.0, 0.0, 1.0],
                        "destination": [80.0, 0.0, 0.0], "speed": 1.3,
                        "quantity": 4, "spawn_interval": 0.25,
                        "group_size": 4}]},
    }
    sfm = {"forces": {"acceleration_force": True, "pedestrian_force": True,
                      "group_force": True}}
    steps = 300
    b = build_scenario(scenario, sfm, steps)
    _, observed = make_rollout_fn(b.scene, b.params, b.cfg, steps)(
        b.initial_state)
    start = replace_params(b.params, {"group.beta_att": 0.5})
    # the windowed teacher-forced objective (built for the power law's
    # hard gates) also makes the group force's q_att gate calibratable:
    # full-trajectory MSE has its minimum at the truth but gate flips make
    # mid-range gradients unreliable (measured sign error at beta=1.5);
    # teacher forcing recovers beta_att to <1% from a 6x-off start
    res = fit_params(b.initial_state, b.scene, start, b.cfg, observed, steps,
                     fit=("group.beta_att",), iters=150, learning_rate=0.1,
                     teacher_window=8, vel_weight=4.0)
    assert res.final_loss < res.initial_loss * 1e-3, \
        (res.initial_loss, res.final_loss)
    assert abs(res.fitted["group.beta_att"] - 3.0) / 3.0 < 0.05, res.fitted


def test_fully_dead_group_grads_finite():
    """Reverse-mode AD regression: a group whose members are all dead at
    the zero-initialized origin (every pre-spawn party) used to poison
    gradients via arctan2(0, 0) / sqrt(0) VJPs (0-cotangent * inf = NaN),
    breaking differentiable calibration for any scenario where a party
    spawns after t = 0."""
    n = 12
    pos = np.zeros((n, 2), np.float32)         # dead slots parked at origin
    vel = np.zeros((n, 2), np.float32)
    desired = np.zeros((n, 2), np.float32)
    alive = np.zeros(n, bool)
    alive[8:] = True                           # some unrelated live slots
    pos[8:] = RNG.uniform(-3, 3, (4, 2)).astype(np.float32)
    gid = np.full(n, -1, np.int32)
    gid[:4] = 0                                # the fully-dead party
    gid[8:] = 1                                # and a live one
    groups = build_groups(gid)
    p = GroupParams()

    def loss(px):
        fx, fy = group_force(
            px, jnp.asarray(pos[:, 1]), jnp.asarray(vel[:, 0]),
            jnp.asarray(vel[:, 1]), jnp.asarray(desired[:, 0]),
            jnp.asarray(desired[:, 1]), jnp.asarray(alive), groups, p)
        return jnp.sum(fx * fx + fy * fy)

    g = jax.grad(loss)(jnp.asarray(pos[:, 0]))
    assert np.isfinite(np.asarray(g)).all(), g

    # and through a rollout whose party spawns late (the calibration path)
    from carla_social_force_model_tpu.api.scenario import build_scenario
    from carla_social_force_model_tpu.api.calibrate import fit_params
    from carla_social_force_model_tpu.api.simulation import Simulation
    scenario = {
        "scenario_name": "late_party", "step_length": 0.05,
        "walker": {"ped_spawner": [
            {"spawn_location": [0.0, 0.0, 1.0], "destination": [30.0, 0.0, 0.0],
             "speed": 1.3, "quantity": 2, "spawn_interval": 0.1},
            {"spawn_location": [-5.0, 2.0, 1.0], "destination": [30.0, 2.0, 0.0],
             "speed": 1.3, "quantity": 3, "spawn_interval": 0.1,
             "spawn_time": 1.0, "group_size": 3},
        ]},
    }
    sfm = {"forces": {"acceleration_force": True, "pedestrian_force": True,
                      "group_force": True}}
    b = build_scenario(scenario, sfm, 40)
    _, observed = Simulation(b).run()
    from carla_social_force_model_tpu.models.state import PedState
    res = fit_params(PedState.empty(b.scene.spawn.capacity), b.scene,
                     b.params, b.cfg, observed, 40,
                     fit=("group.beta_att",), iters=3)
    assert np.isfinite(res.losses).all(), res.losses
    assert np.isfinite(res.fitted["group.beta_att"])
