"""Route parity: the array-backed planner vs the reference-transliterated
networkx oracle (tests/oracle_routing.py) on the multi-road fake town.

Covers the full reference semantics chain on topologies the reference was
built for: road/section/lane nearest-node lookup (path_planner.py:119-143),
A* over filtered subgraphs, detour pruning, per-waypoint crossing flags --
on a map with two junction shapes (4-way corners + T-junction straight), a
curved road, and crosswalk clusters including the 6-point cleanup pattern.
"""
import numpy as np
import pytest

import fake_carla

from carla_social_force_model_tpu.routing.graph import GraphType


@pytest.fixture(scope="module")
def town2(tmp_path_factory):
    m = fake_carla.install_town2()
    import os
    prev = os.getcwd()
    # graph building writes its content-addressed cache under the cwd;
    # point it at a temp dir and RESTORE after the module (a leaked chdir
    # breaks later cwd-relative tests, e.g. subprocess package imports)
    os.chdir(tmp_path_factory.mktemp("cache"))
    try:
        from carla_social_force_model_tpu.routing.carla_graph import (
            build_carla_nav_graph, make_waypoint_locator)
        from carla_social_force_model_tpu.routing.planner import PedPathPlanner
        from oracle_routing import RoutingOracle

        graph = build_carla_nav_graph(m, waypoint_distance=10.0,
                                      jaywalking_weight_factor=2.0)
        planner = PedPathPlanner(graph,
                                 waypoint_locator=make_waypoint_locator(m))
        oracle = RoutingOracle(m, waypoint_distance=10.0,
                               jaywalking_weight_factor=2.0)
        yield m, planner, oracle
    finally:
        os.chdir(prev)


# origin/destination probes spread over every feature of the town
PROBES = [
    (5.0, -7.5), (25.0, -7.5), (40.0, -7.5),        # road 1 south
    (5.0, 7.5), (34.0, 7.5),                        # road 1 north
    (42.5, -20.0), (57.5, -30.0),                   # road 3 west/east
    (42.5, 25.0), (57.5, 25.0),                     # road 4 west/east
    (66.0, -7.5), (90.0, 7.5),                      # road 2 south/north
    (98.5, 20.0), (113.5, -20.0), (113.5, 40.0),    # road 5 west/east
    (60.0, 70.0), (95.0, 100.0),                    # curved road 6
]


def _routes_equal(a, b):
    if len(a) != len(b):
        return False
    for (wa, ca), (wb, cb) in zip(a, b):
        if bool(ca) != bool(cb):
            return False
        if np.linalg.norm(np.asarray(wa) - np.asarray(wb)) > 1e-6:
            return False
    return True


def _path_cost(node_xyzs, oracle):
    """Weighted cost of a node-position path through the oracle graph
    (None when some leg is not a graph edge)."""
    ids = []
    for w in node_xyzs:
        key = tuple(np.round(np.asarray(w, float)[:3], 0))
        if key not in oracle.id_map:
            return None
        ids.append(oracle.id_map[key])
    cost = 0.0
    for u, v in zip(ids[:-1], ids[1:]):
        if not oracle.graph.has_edge(u, v):
            return None
        cost += oracle.graph.edges[(u, v)]["length"]
    return cost


def _parity_ok(got, want, planner, oracle, origin, dest, graph_type):
    """Exact route equality, or -- for equal-cost A* ties (heap insertion
    order is an implementation detail in both networkx and the planner) --
    identical snapped endpoints plus equal raw shortest-path cost."""
    import networkx as nx
    if _routes_equal(got, want):
        return True
    start = planner.nearest_node(origin, graph_type)
    goal = planner.nearest_node(dest, graph_type)
    o_start = oracle._closest_node_id(oracle.carla.Location(*origin[:3]))
    o_goal = oracle._closest_node_id(oracle.carla.Location(*dest[:3]))
    same_ends = (
        np.allclose(planner.graph.nodes[start],
                    np.asarray(oracle.id_map_inv(o_start)))
        and np.allclose(planner.graph.nodes[goal],
                        np.asarray(oracle.id_map_inv(o_goal))))
    if not same_ends:
        return False
    my_path = [planner.graph.nodes[n] for n in
               planner.router.shortest_path(start, goal, graph_type)]
    nx_path = [oracle.id_map_inv(n) for n in nx.astar_path(
        oracle.subgraphs[graph_type], o_start, o_goal, weight="length")]
    cg, cw = _path_cost(my_path, oracle), _path_cost(nx_path, oracle)
    return cg is not None and cw is not None and abs(cg - cw) < 1e-6


@pytest.mark.parametrize("graph_type", [GraphType.NO_JAYWALKING,
                                        GraphType.JAYWALKING_AT_JUNCTION,
                                        GraphType.JAYWALKING])
def test_route_parity_town2(town2, graph_type):
    import networkx as nx
    _, planner, oracle = town2
    rng = np.random.default_rng(0)
    pairs = [(a, b) for a in PROBES for b in PROBES if a != b]
    rng.shuffle(pairs)
    compared = 0
    for a, b in pairs[:80]:
        origin = np.array([a[0], a[1], 0.0])
        dest = np.array([b[0], b[1], 0.0])
        try:
            want = oracle.generate_route(origin, dest, graph_type)
        except (nx.NetworkXNoPath, nx.NodeNotFound):
            # reference would crash here; the planner either also fails or
            # degrades gracefully -- out of parity scope
            continue
        got = planner.generate_route(origin, dest, graph_type)
        assert _parity_ok(got, want, planner, oracle, origin, dest,
                          graph_type), (
            f"{graph_type.name} {a}->{b}\n got: "
            f"{[(np.round(w[:2], 1).tolist(), c) for w, c in got]}\nwant: "
            f"{[(np.round(w[:2], 1).tolist(), c) for w, c in want]}")
        compared += 1
    assert compared >= 40, f"only {compared} comparable pairs"


def test_route_parity_straight_map(tmp_path, monkeypatch):
    """Same parity check on the original single-road map (crosswalk +
    jaywalking edges)."""
    import networkx as nx
    m = fake_carla.install()
    monkeypatch.chdir(tmp_path)
    from carla_social_force_model_tpu.routing.carla_graph import (
        build_carla_nav_graph, make_waypoint_locator)
    from carla_social_force_model_tpu.routing.planner import PedPathPlanner
    from oracle_routing import RoutingOracle

    graph = build_carla_nav_graph(m, waypoint_distance=10.0,
                                  jaywalking_weight_factor=2.0)
    planner = PedPathPlanner(graph, waypoint_locator=make_waypoint_locator(m))
    oracle = RoutingOracle(m, waypoint_distance=10.0,
                           jaywalking_weight_factor=2.0)
    probes = [(2.0, -7.5), (20.0, -7.5), (48.0, -7.5),
              (2.0, 7.5), (25.0, 7.5), (44.0, 7.5)]
    compared = 0
    for gt in GraphType:
        for a in probes:
            for b in probes:
                if a == b:
                    continue
                origin = np.array([a[0], a[1], 0.0])
                dest = np.array([b[0], b[1], 0.0])
                try:
                    want = oracle.generate_route(origin, dest, gt)
                except (nx.NetworkXNoPath, nx.NodeNotFound):
                    continue
                got = planner.generate_route(origin, dest, gt)
                assert _parity_ok(got, want, planner, oracle, origin, dest,
                                  gt), (gt.name, a, b)
                compared += 1
    assert compared >= 60


def test_route_parity_crosstown(tmp_path, monkeypatch):
    """Same parity check on the junction-faithful split-road town (the
    routed_town_walled fixture): 4 corner segments + two crosswalks."""
    import networkx as nx
    m = fake_carla.install_crosstown()
    monkeypatch.chdir(tmp_path)
    from carla_social_force_model_tpu.routing.carla_graph import (
        build_carla_nav_graph, make_waypoint_locator)
    from carla_social_force_model_tpu.routing.planner import PedPathPlanner
    from oracle_routing import RoutingOracle

    graph = build_carla_nav_graph(m, waypoint_distance=10.0,
                                  jaywalking_weight_factor=2.0)
    planner = PedPathPlanner(graph, waypoint_locator=make_waypoint_locator(m))
    oracle = RoutingOracle(m, waypoint_distance=10.0,
                           jaywalking_weight_factor=2.0)
    probes = [(5.0, -7.5), (25.0, -7.5), (40.0, -7.5), (5.0, 7.5),
              (30.0, 7.5), (42.5, -20.0), (57.5, -30.0), (42.5, 25.0),
              (66.0, -7.5), (90.0, 7.5), (70.0, 7.5)]
    rng = np.random.default_rng(1)
    pairs = [(a, b) for a in probes for b in probes if a != b]
    rng.shuffle(pairs)
    compared = 0
    for gt in GraphType:
        for a, b in pairs[:30]:
            origin = np.array([a[0], a[1], 0.0])
            dest = np.array([b[0], b[1], 0.0])
            try:
                want = oracle.generate_route(origin, dest, gt)
            except (nx.NetworkXNoPath, nx.NodeNotFound):
                continue
            got = planner.generate_route(origin, dest, gt)
            assert _parity_ok(got, want, planner, oracle, origin, dest,
                              gt), (gt.name, a, b)
            compared += 1
    assert compared >= 40, f"only {compared} comparable pairs"
