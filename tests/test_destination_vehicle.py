"""Destination-routed vehicles headless: the directed driving-lane graph
(routing/driving.py) and the ``destination``-only reactive spawner surface
(the reference's BehaviorAgent mode, vehicle_spawner.py:131-138).
"""
import os

import numpy as np
import pytest

from carla_social_force_model_tpu.routing.driving import (
    DrivingGraph, DrivingGraphBuilder, build_carla_driving_graph)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CAPTURE = os.path.join(REPO, "configs", "data", "town2_driving.npz")


def _two_lane_graph():
    """Two antiparallel straight lanes with a turnaround stitch at x=100."""
    b = DrivingGraphBuilder()
    b.add_chain([[x, -1.5, 0.0] for x in range(0, 101, 10)])   # eastbound
    b.add_chain([[x, 1.5, 0.0] for x in range(100, -1, -10)])  # westbound
    b.stitch(5.0)  # joins (100,-1.5) end -> (100,1.5) start only
    return b.build(spawn_xyz=[[0.0, -1.5, 0.0], [100.0, 1.5, 0.0]],
                   spawn_yaw=[0.0, np.pi])


def test_directed_routing_and_stitch():
    g = _two_lane_graph()
    # forward along the eastbound lane
    r = g.route([0.0, -1.5], [100.0, -1.5])
    assert len(r) == 11 and np.allclose(r[:, 1], -1.5)
    # "backwards" goes via the turnaround onto the westbound lane, never
    # reversing a directed edge
    r2 = g.route([90.0, -1.5], [10.0, 1.5])
    assert np.allclose(r2[-1], [10.0, 1.5])
    assert (r2[:, 1] == 1.5).any() and len(r2) > 3
    # a destination upstream on the same one-way lane with no turnaround in
    # reach of the snap is still routed via the loop (graph is connected);
    # but a graph without the stitch is not
    b = DrivingGraphBuilder()
    b.add_chain([[x, -1.5, 0.0] for x in range(0, 101, 10)])
    g1 = b.build()
    with pytest.raises(ValueError):
        g1.route([50.0, -1.5], [0.0, -1.5])


def test_npz_roundtrip_and_spawn_points(tmp_path):
    g = _two_lane_graph()
    p = tmp_path / "g.npz"
    g.save_npz(p)
    g2 = DrivingGraph.load_npz(p)
    assert g2.num_nodes == g.num_nodes and g2.num_edges == g.num_edges
    xyz, yaw = g2.spawn_transform(1)
    assert np.allclose(xyz, [100.0, 1.5, 0.0]) and yaw == np.pi
    np.testing.assert_array_equal(g.route([0, -1.5], [100, -1.5]),
                                  g2.route([0, -1.5], [100, -1.5]))


def test_build_from_fake_town_topology():
    import fake_carla
    fmap = fake_carla.install_town2()
    g = build_carla_driving_graph(fmap, waypoint_distance=4.0)
    assert g.num_nodes > 100 and g.num_edges > g.num_nodes * 0.9
    # only driving-lane positions: every node sits within the driving band
    # of some road (lane offset 1.5 m, or junction through-lane nodes a
    # chain-step past a road's end) -- never at the shoulder/sidewalk
    # offsets (+-4.5 / +-7.5, whose nearest-centerline distance is >= 4.5)
    for n in g.nodes:
        dists = []
        for road in fmap.roads.values():
            s, _ = road.locate(n[0], n[1])
            p, _ = road.point_at(s)
            dists.append(float(np.linalg.norm(p - n[:2])))
        assert min(dists) <= 4.4, (n, min(dists))
    # the junction stitch connects road 1 to road 2 across the gap
    r = g.route([4.0, -1.5], [96.0, -1.5])
    assert len(r) >= 20 and np.allclose(r[-1], [96.0, -1.5])


def test_extract_autopilot_specs_destination():
    from carla_social_force_model_tpu.api.scenario import (
        extract_autopilot_specs)
    router = DrivingGraph.load_npz(CAPTURE)
    scenario = {"vehicle": {"vehicle_spawner": [
        # integer indices resolve via the capture's spawn points
        {"auto_pilot": True, "spawn_point": 0, "destination": 1},
        # coordinates work directly
        {"auto_pilot": True, "spawn_location": [51.5, -46.0],
         "destination": [98.8, 98.4]},
        # no router -> destination spawner is skipped with a warning
    ]}}
    specs = extract_autopilot_specs(scenario, router)
    assert len(specs) == 2
    assert len(specs[0].waypoints) >= 20
    assert np.allclose(specs[0].waypoints[-1], [96.0, -1.5])
    assert len(specs[1].waypoints) >= 40
    assert extract_autopilot_specs(scenario, None) == []

    # malformed spawners are skipped with a warning, never raised:
    # out-of-range spawn_point index (IndexError from spawn_transform),
    # a capture without spawn points (ValueError), an unreachable
    # destination (ValueError from route)
    bad = {"vehicle": {"vehicle_spawner": [
        {"auto_pilot": True, "spawn_point": 10_000, "destination": 1},
        {"auto_pilot": True, "destination": [98.8, 98.4]},
    ]}}
    assert extract_autopilot_specs(bad, router) == []
    no_spawn = DrivingGraph(nodes=router.nodes, edge_u=router.edge_u,
                            edge_v=router.edge_v,
                            edge_length=router.edge_length)
    assert extract_autopilot_specs(
        {"vehicle": {"vehicle_spawner": [
            {"auto_pilot": True, "spawn_point": 0, "destination": 1}]}},
        no_spawn) == []


def test_destination_scenario_vehicle_arrives():
    """The shipped destination_vehicle scenario: vehicle 1 (spawn-point
    indices) drives its planned route through the junction and parks at the
    destination; the jaywalking pedestrians exercise gap acceptance."""
    from carla_social_force_model_tpu.api.simulation import Simulation
    from carla_social_force_model_tpu.models import modes

    sim = Simulation.from_config(
        os.path.join(REPO, "configs", "scenarios", "destination_vehicle.toml"),
        os.path.join(REPO, "configs", "sfm.toml"), duration=25.0)
    assert sim.bundle.scene.autopilot.num_vehicles == 2
    _, recs = sim.run()
    v = sim.veh_records
    pos = np.asarray(v.pos)
    active = np.asarray(v.active)
    assert active[:, 0].any() and active[:, 1].any()
    # vehicle 1 reached spawn point 1 (road 2 east end) and deactivated
    assert np.linalg.norm(pos[-1, 0] - [96.0, -1.5]) < 2.0
    assert not active[-1, 0]
    # the crossing machinery engaged against the vehicle
    mode = np.asarray(recs.mode)
    alive = np.asarray(recs.alive)
    assert ((mode == modes.CHECKING_TRAFFIC) & alive).any()
