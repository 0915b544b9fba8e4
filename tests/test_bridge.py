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


def test_bridge_spawn_failure_reuses_slot():
    """A failed world spawn must not leak a state slot (the reference just
    skips, pedestrian_spawner.py:152-153): the next success takes the slot."""
    world = FakeWorld(dt=0.05, fail_spawns={1})
    runner = BridgeRunner(world, SCENARIO, SFM)
    runner.run(60)
    recs = runner.records()
    alive = np.asarray(recs.alive)
    # 4 attempts, 1 failure -> exactly slots 0..2 ever used, slot 3 never
    assert alive[:, 0].any() and alive[:, 1].any() and alive[:, 2].any()
    assert not alive[:, 3].any()
    assert runner._next_slot == 3
    # the reference's name counter advances even on failure
    assert runner._ped_index == 4
    assert runner.slot_name[:3] == ["ped_0", "ped_2", "ped_3"]


def _reference_jitter_oracle(ped_seed, variate, base_speed, draws,
                             blueprint_count):
    """Transliteration of the reference's per-walker seeded draws
    (pedestrian_spawner.py:133-150): seed, blueprint random.choice, uniform
    speed jitter mutating the spawner's speed cumulatively, seed += 1.
    ``draws[i]`` is True when walker i has no explicit blueprint."""
    import random
    speeds = []
    speed = base_speed
    for bp_draw in draws:
        random.seed(ped_seed)
        if bp_draw:
            random.choice(list(range(blueprint_count)))
        speed += random.uniform(-variate, variate)
        ped_seed += 1
        speeds.append(speed)
    return speeds


def test_bridge_seeded_jitter_matches_reference_oracle():
    """Spawn-speed jitter parity: bridge runner == headless schedule ==
    reference-transliterated oracle, including a failed spawn consuming its
    seed and the blueprint draw's entropy preceding the jitter draw."""
    from carla_social_force_model_tpu.models.spawn import (
        WALKER_BLUEPRINT_COUNT, build_spawn_schedule)
    from carla_social_force_model_tpu.api.scenario import extract_ped_spawners

    scenario = {
        "step_length": 0.05,
        "walker": {
            "pedestrian_seed": 77, "variate_speed": 0.25,
            "despawn_on_arrival": False, "waypoint_threshold": 1,
            "ped_spawner": [
                {"spawn_location": [-6.0, 0.0, 1.0],
                 "destination": [6.0, 0.0, 0.0],
                 "speed": 1.3, "quantity": 4, "spawn_interval": 0.5}],
        },
    }
    expect = _reference_jitter_oracle(77, 0.25, 1.3, [True] * 4,
                                      WALKER_BLUEPRINT_COUNT)

    # bridge path, with the second spawn failing (still consumes seed 78)
    world = FakeWorld(dt=0.05, fail_spawns={1})
    runner = BridgeRunner(world, scenario, SFM)
    runner.run(40)
    got_bridge = [float(runner.h["base_speed"][s]) for s in range(3)]
    np.testing.assert_allclose(
        got_bridge, [expect[0], expect[2], expect[3]], rtol=0, atol=1e-6)

    # headless schedule (no spawn failures there) matches draw-for-draw
    specs = extract_ped_spawners(scenario)
    sched = build_spawn_schedule(specs, 0.05, 40, pedestrian_seed=77,
                                 variate_speed=0.25)
    np.testing.assert_allclose(np.asarray(sched.speed), expect,
                               rtol=0, atol=1e-6)

    # an explicit blueprint skips the library draw (reference :135-136)
    scenario["walker"]["ped_spawner"][0]["blueprint"] = "walker.pedestrian.0001"
    expect_bp = _reference_jitter_oracle(77, 0.25, 1.3, [False] * 4,
                                         WALKER_BLUEPRINT_COUNT)
    sched_bp = build_spawn_schedule(extract_ped_spawners(scenario), 0.05, 40,
                                    pedestrian_seed=77, variate_speed=0.25)
    np.testing.assert_allclose(np.asarray(sched_bp.speed), expect_bp,
                               rtol=0, atol=1e-6)
    assert not np.allclose(np.asarray(sched_bp.speed), expect)


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


class _DrawCountingWorld(FakeWorld):
    """FakeWorld recording draw_points calls (debug-draw wiring test)."""

    def __post_init__(self):
        super().__post_init__()
        self.draw_calls = []

    def draw_points(self, points, life_time) -> None:
        self.draw_calls.append((np.asarray(points).shape[0], float(life_time)))


def test_bridge_draw_obstacles_wiring():
    """map.draw_obstacles draws static geometry at startup (life 30,
    run_simulation.py:194-197) and vehicle outlines each tick (life dt,
    run_simulation.py:97-99)."""
    speed, length = 8.0, 40
    ys = -30.0 + speed * 0.05 * np.arange(length)
    vspec = VehicleSpec(
        trajectory=np.column_stack([np.full(length, 12.0), ys]),
        headings=np.full(length, np.pi / 2), speeds=np.full(length, speed))
    timeline = build_vehicle_states([vspec], 0.05, 30)
    world = _DrawCountingWorld(dt=0.05, vehicle_timeline=timeline)

    scenario = dict(SCENARIO)
    scenario["map"] = {"draw_obstacles": True}
    runner = BridgeRunner(world, scenario, SFM)
    startup = [c for c in world.draw_calls if c[1] == 30.0]
    assert len(startup) == len(runner.border_lines)  # one call per border
    runner.run(10)
    per_tick = [c for c in world.draw_calls if c[1] == runner.cfg.dt]
    # vehicle becomes visible from its second timeline index onward
    assert len(per_tick) >= 8
    # without the flag: no draw calls at all
    world2 = _DrawCountingWorld(dt=0.05, vehicle_timeline=timeline)
    runner2 = BridgeRunner(world2, SCENARIO, SFM)
    runner2.run(5)
    assert world2.draw_calls == []
