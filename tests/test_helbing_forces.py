"""Helbing-1995 extension forces (the reference's dead config paths, made
to work) vs the oracle."""
import numpy as np
import jax.numpy as jnp
import pytest

import oracle
from carla_social_force_model_tpu.env.pointsets import build_chunked_pointset
from carla_social_force_model_tpu.models.params import (
    PedRepulsiveParams, SfmParams, SpaceRepulsiveParams)
from carla_social_force_model_tpu.ops import forces

RNG = np.random.default_rng(19)


def test_ped_repulsive_matches_oracle():
    n = 30
    pos = RNG.uniform(-8, 8, (n, 2))
    vel = RNG.uniform(-2, 2, (n, 2))
    desired = RNG.uniform(-1, 1, (n, 2))
    desired /= np.linalg.norm(desired, axis=-1, keepdims=True)
    alive = RNG.uniform(size=n) < 0.85
    p = PedRepulsiveParams()
    got = forces.ped_repulsive_force(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(desired, jnp.float32), jnp.asarray(alive), p)
    want = oracle.ped_repulsive_force(pos, vel, desired, alive, p.v0, p.sigma,
                                      p.fov_phi, p.fov_factor, p.step_width)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)


def test_ped_repulsive_pushes_apart_and_fov_weakens_behind():
    # two peds close together, i facing +x, j directly behind i
    pos = jnp.asarray([[0.0, 0.0], [-0.8, 0.0]], jnp.float32)
    vel = jnp.zeros((2, 2), jnp.float32)
    desired = jnp.asarray([[1.0, 0.0], [1.0, 0.0]], jnp.float32)
    p = PedRepulsiveParams()
    f = np.asarray(forces.ped_repulsive_force(
        pos, vel, desired, jnp.ones((2,), bool), p))
    assert f[0, 0] > 0 and f[1, 0] < 0   # pushed apart along x
    # source behind pedestrian 0 -> weighted by fov_factor; pedestrian 1
    # sees 0 in front -> full weight
    assert abs(f[0, 0]) == pytest.approx(abs(f[1, 0]) * p.fov_factor, rel=1e-3)


def test_space_repulsive_matches_oracle():
    n = 25
    pos = RNG.uniform(-9, 9, (n, 2)) * np.array([1.0, 0.12])
    alive = np.ones(n, bool)
    mode = RNG.integers(0, 5, n)
    walls = [np.column_stack([np.linspace(-10, 10, 201), np.full(201, 1.2)]),
             np.column_stack([np.linspace(-10, 10, 201), np.full(201, -1.2)])]
    centers = [w[len(w) // 2] for w in walls]
    lengths = [len(w) * 0.1 for w in walls]
    pset = build_chunked_pointset(walls, np.asarray(centers),
                                  np.asarray(lengths), chunk_size=64)
    p = SpaceRepulsiveParams()
    got = forces.space_repulsive_force(
        jnp.asarray(pos, jnp.float32), jnp.asarray(mode, jnp.int32),
        jnp.asarray(alive), pset, p)
    want = oracle.space_repulsive_force(pos, mode, alive, walls, centers,
                                        lengths, p.u0, p.r)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-3)


def test_config_enables_helbing_forces():
    cfg = {"forces": {"acceleration_force": True, "ped_repulsive_force": True,
                      "space_repulsive_force": True},
           "ped_repulsive_force": {"v0": 3.0, "sigma": 0.2},
           "space_repulsive_force": {"u0": 8.0, "r": 0.4}}
    params = SfmParams.from_dict(cfg)
    assert params.enable_ped_repulsive and params.enable_space_repulsive
    assert params.ped_repulsive.v0 == 3.0
    assert params.space_repulsive.r == 0.4
    with pytest.raises(ValueError):
        SfmParams.from_dict(cfg, strict_parity=True)


def test_helbing_forces_run_in_stepper():
    from carla_social_force_model_tpu.api.simulation import Simulation
    scenario = {
        "step_length": 0.05,
        "walker": {"despawn_on_arrival": True, "waypoint_threshold": 1,
                   "ped_spawner": [
                       {"spawn_location": [-5.0, 0.2, 1.0],
                        "destination": [5.0, 0.2, 0.0], "speed": 1.3,
                        "quantity": 2, "spawn_interval": 1.0},
                       {"spawn_location": [5.0, -0.2, 1.0],
                        "destination": [-5.0, -0.2, 0.0], "speed": 1.3,
                        "quantity": 2, "spawn_interval": 1.0}]},
        "obstacles": {"resolution": 0.1, "borders": [
            {"start_point": [-7.0, 1.0], "end_point": [7.0, 1.0]},
            {"start_point": [-7.0, -1.0], "end_point": [7.0, -1.0]}]},
    }
    sfm = {"forces": {"acceleration_force": True, "ped_repulsive_force": True,
                      "space_repulsive_force": True}}
    sim = Simulation.from_config(scenario, sfm, duration=15.0)
    final, recs = sim.run()
    assert np.all(np.isfinite(np.asarray(recs.pos)))
    assert int(np.asarray(final.alive).sum()) == 0  # everyone arrived
