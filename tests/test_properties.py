"""Property and fuzz tests: invariants the engine must never violate."""
import numpy as np
import jax.numpy as jnp
import pytest

from carla_social_force_model_tpu.api.simulation import Simulation
from carla_social_force_model_tpu.api.synthetic import benchmark_bundle
from carla_social_force_model_tpu.models.stepper import make_rollout_fn
from carla_social_force_model_tpu.ops import vecmath
from carla_social_force_model_tpu.ops.geometry import segment_intersection

RNG = np.random.default_rng(31)


def test_speed_cap_never_exceeded():
    """cap = applied_target * max_speed_factor (reference rule)."""
    n, steps = 32, 120
    scene, params, cfg, state = benchmark_bundle(n, extent=10.0)
    run = make_rollout_fn(scene, params, cfg, steps, record=True)
    _, recs = run(state)
    speed = np.linalg.norm(np.asarray(recs.vel), axis=-1)      # (T, N)
    alive = np.asarray(recs.alive)                              # (T, N)
    cap = np.asarray(scene.spawn.speed)[None, :] * params.max_speed_factor
    cap = np.broadcast_to(cap, speed.shape)
    # recorded vel is the previous tick's commanded velocity; must obey cap
    assert (speed[alive] <= cap[alive] + 1e-4).all()


def test_fuzzed_scenarios_stay_finite():
    """Random extreme scenarios never produce NaN/inf positions."""
    for trial in range(4):
        rng = np.random.default_rng(trial)
        n_spawners = int(rng.integers(1, 4))
        spawners = []
        for _ in range(n_spawners):
            a = rng.uniform(-5, 5, 2)
            b = rng.uniform(-5, 5, 2)  # possibly extremely close to a
            spawners.append({
                "spawn_location": [float(a[0]), float(a[1]), 1.0],
                "destination": [float(b[0]), float(b[1]), 0.0],
                "speed": float(rng.uniform(0.0, 5.0)),   # includes speed 0
                "quantity": int(rng.integers(1, 5)),
                "spawn_interval": float(rng.uniform(0.01, 1.0)),
                "crossing_speed_factor": float(rng.uniform(0.0, 2.0)),
                "crossing_safety_margin": float(rng.uniform(-2.0, 2.0)),
            })
        scenario = {"step_length": 0.05,
                    "walker": {"despawn_on_arrival": bool(trial % 2),
                               "waypoint_threshold": 0.5,
                               "ped_spawner": spawners}}
        sfm = {"forces": {"acceleration_force": True, "pedestrian_force": True}}
        sim = Simulation.from_config(scenario, sfm, duration=8.0)
        _, recs = sim.run()
        pos = np.asarray(recs.pos)
        alive = np.asarray(recs.alive)
        assert np.isfinite(pos[alive]).all(), f"trial {trial} produced non-finite"


def test_angle_wrap_matches_numpy():
    a = RNG.uniform(-1, 1, (200, 2))
    b = RNG.uniform(-1, 1, (200, 2))
    got = np.asarray(vecmath.angle_diff_2d(jnp.asarray(a), jnp.asarray(b)))
    want = np.arctan2(a[:, 1], a[:, 0]) - np.arctan2(b[:, 1], b[:, 0])
    want = np.where(want > np.pi, want - 2 * np.pi, want)
    want = np.where(want < -np.pi, want + 2 * np.pi, want)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_cap_velocity_zero_and_exceeding():
    v = jnp.asarray([[0.0, 0.0], [3.0, 4.0], [0.3, 0.4]])
    capped = np.asarray(vecmath.cap_velocity(v, jnp.asarray([1.0, 1.0, 1.0])))
    np.testing.assert_allclose(capped[0], [0.0, 0.0])
    np.testing.assert_allclose(np.linalg.norm(capped[1]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(capped[2], [0.3, 0.4], rtol=1e-6)  # under cap


def test_segment_intersection_edge_cases():
    p0 = jnp.asarray([[0.0, 0.0]] * 4)
    p1 = jnp.asarray([[2.0, 0.0]] * 4)
    q0 = jnp.asarray([[1.0, -1.0],   # crossing
                      [1.0, 1.0],    # misses (wrong side)
                      [0.0, 1.0],    # parallel
                      [2.0, 0.0]])   # touches at the endpoint
    q1 = jnp.asarray([[1.0, 1.0],
                      [1.0, 2.0],
                      [2.0, 1.0],
                      [2.0, 1.0]])
    hit, point = segment_intersection(p0, p1, q0, q1)
    assert bool(hit[0]) and not bool(hit[1]) and not bool(hit[2])
    assert bool(hit[3])  # endpoint touch counts (t=1, u=0)
    np.testing.assert_allclose(np.asarray(point[0]), [1.0, 0.0], atol=1e-6)


def test_rectangle_obstacle_outline():
    from carla_social_force_model_tpu.env.obstacles_gen import rectangle_outline
    pts = rectangle_outline([3.0, 2.0], [2.0, 1.0], heading=0.0, resolution=0.5)
    # all points on the bbox boundary
    local = pts - np.array([3.0, 2.0])
    on_x_edge = np.isclose(np.abs(local[:, 0]), 2.0, atol=1e-9)
    on_y_edge = np.isclose(np.abs(local[:, 1]), 1.0, atol=1e-9)
    assert (on_x_edge | on_y_edge).all()
    assert len(pts) >= 4 * 2
    # rotation preserves distances from center
    rot = rectangle_outline([0.0, 0.0], [2.0, 1.0], heading=0.7, resolution=0.5)
    base = rectangle_outline([0.0, 0.0], [2.0, 1.0], heading=0.0, resolution=0.5)
    np.testing.assert_allclose(np.sort(np.linalg.norm(rot, axis=1)),
                               np.sort(np.linalg.norm(base, axis=1)), atol=1e-9)
