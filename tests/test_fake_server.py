"""The live-CARLA code path (bridge/carla_world.py + vehicle_spawner.py)
executed against the in-process fake server (fake_carla.install_server).

This is the closest headless stand-in for a live server run: the real
client-setup, batched spawning, WalkerControl, TrafficManager-knob and
settings-restore code executes, with only the RPC transport replaced.
"""
import numpy as np
import pytest

import fake_carla


SCENARIO = {
    "scenario_name": "fake-server-corridor",
    "step_length": 0.05,
    "map": {},
    "walker": {
        "pedestrian_seed": 2000,
        "despawn_on_arrival": True,
        "waypoint_threshold": 1.0,
        "initial_velocity": "zero",
        "ped_spawner": [
            {"spawn_location": [-6.0, 0.0, 1.0], "destination": [6.0, 0.0, 0.0],
             "speed": 1.3, "quantity": 2, "spawn_interval": 1.0}],
    },
}

SFM = {
    "forces": {"acceleration_force": True, "pedestrian_force": True},
    "acceleration_force": {"tau": 0.5},
}


@pytest.fixture()
def server(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    m, world = fake_carla.install_server()
    return m, world


def _carla_world(scenario):
    from carla_social_force_model_tpu.bridge.carla_world import CarlaWorld
    return CarlaWorld("localhost", 2000, scenario)


def test_carla_world_setup_and_restore(server):
    _, world = server
    cw = _carla_world(SCENARIO)
    s = world._settings
    assert s.synchronous_mode and s.deterministic_ragdolls
    assert s.fixed_delta_seconds == 0.05
    assert world.pedestrians_seed == 2000
    assert cw.walker_blueprint_count() == 41
    cw.close()
    assert not world._settings.synchronous_mode   # restored


def test_carla_world_walker_roundtrip(server):
    _, world = server
    cw = _carla_world(SCENARIO)
    aid = cw.spawn_walker(3, np.array([1.0, 2.0, 1.0]), 0.0,
                          role_name="ped_0")
    assert aid > 0
    assert world.get_actor(aid).type_id == "walker.pedestrian.0004"
    assert abs(cw.get_walker_radius(aid) - 0.19) < 1e-9
    cw.set_walker_velocity(aid, np.array([1.0, 0.0, 0.0]), 2.0)
    cw.tick()
    loc, vel = cw.get_walker_state(aid)
    np.testing.assert_allclose(loc[:2], [1.1, 2.0], atol=1e-9)
    np.testing.assert_allclose(vel[:2], [2.0, 0.0], atol=1e-9)
    assert abs(cw.get_sim_time() - 0.05) < 1e-9
    cw.destroy_actor(aid)
    assert world.get_actor(aid) is None
    cw.close()


def test_bridge_runner_on_fake_server(server):
    """Full BridgeRunner ticks over the real CarlaWorld adapter: walkers
    spawn via batched commands, velocities go through WalkerControl, the
    server integrates them, and everyone crosses the corridor."""
    from carla_social_force_model_tpu.bridge.runner import BridgeRunner
    cw = _carla_world(SCENARIO)
    runner = BridgeRunner(cw, SCENARIO, SFM)
    runner.run(260)
    recs = runner.records()
    alive = np.asarray(recs.alive)
    assert alive.any()
    assert alive[-1].sum() == 0           # everyone arrived and despawned
    pos = np.asarray(recs.pos)
    assert pos[alive].max() > 4.0         # actually walked the corridor
    cw.close()


def test_bridge_runner_spawn_failure_on_server(server):
    from carla_social_force_model_tpu.bridge.runner import BridgeRunner
    fake_carla.Client.fail_walker_spawns = {0}
    cw = _carla_world(SCENARIO)
    runner = BridgeRunner(cw, SCENARIO, SFM)
    runner.run(40)
    # first batch spawn failed -> slot 0 taken by the second walker
    assert runner._next_slot == 1
    assert runner._ped_index == 2
    assert runner.slot_name[0] == "ped_1"
    cw.close()


def test_vehicle_manager_traffic_manager_mode(server):
    """BridgeVehicleManager TM-autopilot path: batched spawn+SetAutopilot,
    per-vehicle percentage knobs, seeded blueprint draw, exhaustion."""
    from carla_social_force_model_tpu.bridge.vehicle_spawner import (
        BridgeVehicleManager)
    _, world = server
    scenario = dict(SCENARIO)
    scenario["vehicle"] = {
        "vehicle_seed": 2000, "no_bikes": True,
        "vehicle_spawner": [{
            "spawn_point": 0, "auto_pilot": True, "use_traffic_manager": True,
            "speed_reduction_factor": 40,
            "ignore_walkers_percentage": 25, "ignore_lights_percentage": 50,
            "quantity": 2, "spawn_time": 0.0, "spawn_interval": 1.0}],
    }
    cw = _carla_world(scenario)
    mgr = BridgeVehicleManager(cw, scenario)
    assert all(int(b.get_attribute("number_of_wheels")) == 4
               for b in mgr.blueprints)        # no_bikes filtered
    assert mgr.tm.synchronous and mgr.tm.seed == 2000

    mgr.tick(0.0)
    assert len(mgr.vehicle_ids) == 1
    v0 = world.get_actor(mgr.vehicle_ids[0])
    assert v0.autopilot
    calls = {c[0]: c[2] for c in mgr.tm.calls if c[1] == v0.id}
    assert calls == {"speed_difference": 40.0, "ignore_walkers": 25.0,
                     "ignore_lights": 50.0}

    # TM vehicle actually moves on server ticks and is read back
    cw.tick()
    cw.tick()
    obs = cw.get_vehicles()
    assert len(obs) == 1 and np.linalg.norm(obs[0].velocity) > 0.1

    mgr.tick(1.0)
    assert len(mgr.vehicle_ids) == 2
    mgr.tick(2.0)
    assert len(mgr.vehicle_ids) == 2      # quantity exhausted
    assert mgr.spawners == []             # spawner list drained
    mgr.close()
    assert all(world.get_actor(v) is None for v in mgr.vehicle_ids)
    cw.close()


def test_vehicle_manager_scripted_mode(server):
    """Scripted (auto_pilot=false) vehicles: spawn consumes trajectory index
    0, CarlaWorld teleports through the list before each tick, despawn on
    exhaustion (reference run_simulation.py:56-67 contract)."""
    from carla_social_force_model_tpu.bridge.vehicle_spawner import (
        BridgeVehicleManager)
    _, world = server
    traj = [[0.0, -5.0], [0.0, -4.0], [0.0, -3.0], [0.0, -2.0]]
    scenario = dict(SCENARIO)
    scenario["vehicle"] = {
        "vehicle_spawner": [{
            "auto_pilot": False, "blueprint": "vehicle.audi.tt",
            "trajectory": [list(p) for p in traj],
            "headings": [np.pi / 2] * 4, "speeds": [20.0, 20.0, 20.0, 20.0],
            "quantity": 1}],
    }
    cw = _carla_world(scenario)
    mgr = BridgeVehicleManager(cw, scenario)
    mgr.tick(0.0)
    vid = mgr.vehicle_ids[0]
    ys = []
    for _ in range(4):
        cw.tick()
        actor = world.get_actor(vid)
        ys.append(actor.get_transform().location.y if actor else None)
    # teleported through indices 1..3 then destroyed on exhaustion
    assert ys[:3] == [-4.0, -3.0, -2.0]
    assert ys[3] is None
    cw.close()


def test_full_bridge_stack_on_town2(tmp_path, monkeypatch):
    """The entire CARLA-attached main loop (bridge/carla_bridge.py:
    CarlaWorld + sidewalk/obstacle extraction + nav-graph routing +
    BridgeVehicleManager + BridgeRunner + CSV teardown) on the multi-road
    fake town through the fake server -- the closest headless stand-in for
    the reference's live operating mode (run_simulation.py:160-229)."""
    import types as _types
    monkeypatch.chdir(tmp_path)
    m, world = fake_carla.install_server(fake_carla.Town2Map())

    scenario = {
        "scenario_name": "town2-bridge",
        "step_length": 0.05,
        "map": {},
        "walker": {
            "pedestrian_seed": 7, "despawn_on_arrival": True,
            "waypoint_threshold": 1.5, "waypoint_distance": 10,
            "ped_spawner": [{
                # routed over the nav graph: road 1 south -> road 2 south,
                # crossing at the 6-point crosswalk on road 3
                "spawn_location": [30.0, -7.5, 0.3],
                "destination": [66.0, -7.5, 0.0],
                "generate_route": "NO_JAYWALKING",
                "speed": 1.4, "quantity": 2, "spawn_interval": 1.0}],
        },
        "vehicle": {
            "vehicle_seed": 9,
            "vehicle_spawner": [{
                "spawn_point": 0, "auto_pilot": True,
                "use_traffic_manager": True, "quantity": 1}],
        },
        "obstacles": {"resolution": 0.5},
    }
    # the fake Town2 has no env objects; spawn points come from install_server
    args = _types.SimpleNamespace(
        scenario_config=scenario, carla_host="localhost", carla_port=2000,
        csv=True, output=str(tmp_path / "out"), strict_parity=False)
    sfm = {"forces": {"acceleration_force": True, "pedestrian_force": True,
                      "border_force": True},
           "border_force": {"a": 3.0, "b": 0.3}}

    from carla_social_force_model_tpu.bridge.carla_bridge import run_with_carla
    rc = run_with_carla(args, sfm, max_steps=900, pace=False)
    assert rc == 0

    # CSV written with the reference schemas
    import os, csv
    outdirs = os.listdir(tmp_path / "out")
    assert len(outdirs) == 1
    ped_csv = tmp_path / "out" / outdirs[0] / "pedestrian.csv"
    rows = list(csv.reader(open(ped_csv)))
    assert rows[0] == ["ped_id", "frame", "time", "x", "y", "v_x", "v_y",
                       "mode"]
    assert len(rows) > 100
    # pedestrians actually crossed road 3 (x goes from <44 to >56) and the
    # route used the crosswalk (mode CROSSING_ROAD=2 appears)
    xs = np.array([float(r[3]) for r in rows[1:]])
    modes = np.array([int(r[7]) for r in rows[1:]])
    assert xs.min() < 40.0 and xs.max() > 56.0
    assert (modes == 2).any()
    # borders.csv carries the extracted sidewalk borders of all 6 roads
    borders = list(csv.reader(open(tmp_path / "out" / outdirs[0]
                                   / "borders.csv")))
    assert len(borders) > 500


def test_random_pedestrians_from_live_nav_mesh(tmp_path, monkeypatch):
    """random_pedestrians on the bridge draw origins/destinations from the
    (fake) server's nav mesh (pedestrian_spawner.py:106-124), and the same
    draws can be recorded and replayed headless via nav_mesh_sampler."""
    monkeypatch.chdir(tmp_path)
    m, world = fake_carla.install_server(fake_carla.Town2Map())
    world.set_pedestrians_seed(5)
    from carla_social_force_model_tpu.routing.carla_graph import (
        build_carla_nav_graph, make_waypoint_locator)
    from carla_social_force_model_tpu.routing.planner import PedPathPlanner
    from carla_social_force_model_tpu.api.scenario import (
        nav_mesh_sampler, random_ped_spawners)

    graph = build_carla_nav_graph(m, waypoint_distance=10.0)
    planner = PedPathPlanner(graph, waypoint_locator=make_waypoint_locator(m))

    def live_sampler(rng):
        loc = world.get_random_location_from_navigation()
        return [loc.x, loc.y, loc.z]

    specs = random_ped_spawners(planner, 4, seed=11,
                                location_sampler=live_sampler)
    assert len(specs) == 4
    for s in specs:
        assert len(s.waypoints) >= 1
        # origins are nav-mesh points (off the node grid), not graph nodes
        d_node = np.linalg.norm(graph.nodes[:, :2]
                                - s.spawn_location[:2], axis=1).min()
        assert d_node > 1e-9

    # record a sample set and replay it headless: same structure
    pts = np.array([[world.get_random_location_from_navigation().x,
                     world.get_random_location_from_navigation().y, 0.0]
                    for _ in range(64)])
    np.save(tmp_path / "navmesh.npy", pts)
    sampler = nav_mesh_sampler(str(tmp_path / "navmesh.npy"))
    specs2 = random_ped_spawners(planner, 4, seed=11,
                                 location_sampler=sampler)
    assert len(specs2) == 4
    for s in specs2:
        assert any(np.allclose(s.spawn_location[:2], p[:2], atol=20.0)
                   for p in pts)


def test_vehicle_manager_behavior_agent_mode(server):
    """BehaviorAgent branch (bridge/vehicle_spawner.py:125-135): with
    auto_pilot and use_traffic_manager=false the manager constructs a
    (fake) agents.navigation BehaviorAgent, sets its destination from the
    spawn-point index (reference vehicle_spawner.py:131-138), honors the
    ignore-lights knob, and drives the vehicle with per-tick run_step
    controls until arrival."""
    from carla_social_force_model_tpu.bridge.vehicle_spawner import (
        BridgeVehicleManager)
    _, world = server
    fake_carla.install_agents()
    scenario = dict(SCENARIO)
    scenario["vehicle"] = {
        "vehicle_seed": 2000,
        "vehicle_spawner": [{
            "spawn_point": 0, "auto_pilot": True,
            "use_traffic_manager": False, "destination": 1,
            "ignore_lights_percentage": 100,
            "quantity": 1, "spawn_time": 0.0}],
    }
    cw = _carla_world(scenario)
    mgr = BridgeVehicleManager(cw, scenario)
    mgr.tick(0.0)
    assert len(mgr.agents) == 1
    vid, agent = next(iter(mgr.agents.items()))
    assert agent._ignore_lights          # ignore_lights_percentage > 0
    assert not world.get_actor(vid).autopilot   # not a TM vehicle

    dest = cw.carla_map.get_spawn_points()[1].location
    d0 = world.get_actor(vid).get_location().distance(dest)
    for i in range(400):
        mgr.tick(0.05 * (i + 1))   # agent.run_step -> apply_control
        cw.tick()
        if agent.done():
            break
    assert agent.run_steps > 0
    d1 = world.get_actor(vid).get_location().distance(dest)
    assert agent.done() and d1 < d0 and d1 < 3.0
    mgr.close()
    cw.close()
