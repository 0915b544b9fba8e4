"""Bridge sync logic against the in-process FakeWorld.

The FakeWorld integrates commanded walker velocities over one fixed step --
exactly what CARLA does with WalkerControl -- so a bridge run must reproduce
the headless engine's trajectories (same math, same ordering, different
integrator owner).
"""
import numpy as np

from carla_social_force_model_tpu.api.simulation import Simulation
from carla_social_force_model_tpu.bridge.runner import BridgeRunner
from carla_social_force_model_tpu.bridge.world import FakeWorld
from carla_social_force_model_tpu.models.vehicles import VehicleSpec, build_vehicle_states

SFM = {
    "max_speed_multiplier": 1.3,
    "forces": {"acceleration_force": True, "pedestrian_force": True,
               "border_force": True},
    "acceleration_force": {"tau": 0.5},
    "pedestrian_force": {"lambda": 2.0, "A": 4.5, "gamma": 0.35, "n": 2.0,
                         "n_prime": 3.0, "epsilon": 0.005},
    "border_force": {"a": 6.0, "b": 0.3},
}

SCENARIO = {
    "scenario_name": "bridge-corridor",
    "step_length": 0.05,
    "walker": {
        "despawn_on_arrival": True,
        "waypoint_threshold": 1,
        "default_radius": 0.3,
        # CARLA-faithful: a fresh walker reads back ~zero velocity, so the
        # headless run must match that for bit-equivalence with the bridge
        "initial_velocity": "zero",
        "ped_spawner": [
            {"spawn_location": [-6.0, 0.4, 1.0], "destination": [6.0, 0.4, 0.0],
             "speed": 1.3, "quantity": 2, "spawn_time": 0.0, "spawn_interval": 1.2},
            {"spawn_location": [6.0, -0.4, 1.0], "destination": [-6.0, -0.4, 0.0],
             "speed": 1.2, "quantity": 2, "spawn_time": 0.4, "spawn_interval": 1.2},
        ],
    },
    "obstacles": {
        "resolution": 0.1,
        "borders": [
            {"start_point": [-8.0, 1.5], "end_point": [8.0, 1.5]},
            {"start_point": [-8.0, -1.5], "end_point": [8.0, -1.5]},
        ],
    },
}

STEPS = 280


def test_bridge_matches_headless():
    world = FakeWorld(dt=0.05, walker_radius=0.3)
    runner = BridgeRunner(world, SCENARIO, SFM)
    runner.run(STEPS)
    recs_bridge = runner.records()

    sim = Simulation.from_config(SCENARIO, SFM, num_steps=STEPS)
    _, recs_headless = sim.run()

    alive_b = np.asarray(recs_bridge.alive)
    alive_h = np.asarray(recs_headless.alive)
    np.testing.assert_array_equal(alive_b, alive_h)
    np.testing.assert_array_equal(np.asarray(recs_bridge.mode)[alive_b],
                                  np.asarray(recs_headless.mode)[alive_h])
    err = np.abs(np.asarray(recs_bridge.pos) - np.asarray(recs_headless.pos))
    err = np.where(alive_b[..., None], err, 0.0)
    assert err.max() < 1e-4, err.max()
    # everyone crossed and despawned
    assert alive_b[-1].sum() == 0
    assert alive_b.any()


def test_bridge_spawn_failure_is_skipped():
    world = FakeWorld(dt=0.05, fail_spawns={1})
    runner = BridgeRunner(world, SCENARIO, SFM)
    runner.run(60)
    recs = runner.records()
    alive = np.asarray(recs.alive)
    # slot 1's spawn failed: it must never appear
    assert not alive[:, 1].any()
    assert alive[:, 0].any() and alive[:, 2].any()


def test_bridge_with_vehicles_gap_acceptance():
    """Ped at a curb waits for a scripted vehicle before crossing."""
    speed, y0, x, length = 8.0, -30.0, 12.0, 140
    ys = y0 + speed * 0.05 * np.arange(length)
    vspec = VehicleSpec(
        trajectory=np.column_stack([np.full(length, x), ys]),
        headings=np.full(length, np.pi / 2), speeds=np.full(length, speed))
    timeline = build_vehicle_states([vspec], 0.05, 260)

    scenario = {
        "step_length": 0.05,
        "walker": {
            "despawn_on_arrival": True, "waypoint_threshold": 1,
            "ped_spawner": [{
                "spawn_location": [4.0, 0.0, 1.0],
                "waypoints": [[9.0, 0.0], [15.0, 0.0]],
                "crossing_road_bools": [False, True, False],
                "destination": [20.0, 0.0, 0.0],
                "speed": 1.5, "quantity": 1,
                "crossing_speed_factor": 1.5, "crossing_safety_margin": 1.5}],
        },
    }
    sfm = dict(SFM)
    sfm["forces"] = dict(SFM["forces"], dynamic_obstacle_force=True,
                         border_force=False)
    sfm["dynamic_obstacle_force"] = {
        "lambda": 2.0, "A": 50.0, "gamma": 0.4, "n": 1.0, "n_prime": 3.0,
        "epsilon": 0.005, "perception_threshold": 50.0}

    world = FakeWorld(dt=0.05, vehicle_timeline=timeline)
    runner = BridgeRunner(world, scenario, sfm)
    runner.run(260)
    recs = runner.records()
    mode = np.asarray(recs.mode)[:, 0]
    alive = np.asarray(recs.alive)[:, 0]
    # waited at the curb (CHECKING_TRAFFIC visible for several ticks)
    assert (mode[alive] == 4).sum() > 3
    # eventually crossed and despawned
    assert (mode[alive] == 2).any()
    assert not alive[-1]
