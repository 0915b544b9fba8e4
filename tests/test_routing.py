"""Nav-graph routing: A* (native vs Python), subgraphs, crossing flags."""
import numpy as np
import pytest

from carla_social_force_model_tpu.routing.astar import AStarRouter
from carla_social_force_model_tpu.routing.graph import (
    EdgeType, GraphType, NavGraph, NavGraphBuilder)
from carla_social_force_model_tpu.routing.planner import PedPathPlanner


def city_block_graph():
    """Two parallel sidewalks (y=0 and y=10) joined by a crosswalk at x=50
    and a jaywalking edge at x=20."""
    b = NavGraphBuilder(jaywalking_weight_factor=2.0)
    xs = np.arange(0, 101, 10.0)
    south = [np.array([x, 0.0, 0.0]) for x in xs]
    north = [np.array([x, 10.0, 0.0]) for x in xs]
    b.add_polyline(south, EdgeType.SIDEWALK)
    b.add_polyline(north, EdgeType.SIDEWALK)
    b.add_edge([50.0, 0.0, 0.0], [50.0, 10.0, 0.0], EdgeType.CROSSWALK)
    b.add_edge([20.0, 0.0, 0.0], [20.0, 10.0, 0.0], EdgeType.JAYWALKING)
    return b.build()


def test_jaywalking_weight_applied():
    g = city_block_graph()
    jay = g.edge_type == int(EdgeType.JAYWALKING)
    assert np.allclose(g.edge_length[jay], 20.0)  # 10m * factor 2
    cross = g.edge_type == int(EdgeType.CROSSWALK)
    assert np.allclose(g.edge_length[cross], 10.0)


def test_subgraph_filtering():
    g = city_block_graph()
    planner = PedPathPlanner(g)
    origin, dest = [0.0, 0.0, 0.0], [0.0, 10.0, 0.0]
    # no jaywalking: must detour via the crosswalk at x=50
    route_nj = planner.generate_route(origin, dest, GraphType.NO_JAYWALKING)
    xs = [w[0][0] for w in route_nj]
    assert max(xs) == 50.0
    assert any(c for _, c in route_nj)  # crosswalk flagged as crossing
    # jaywalking allowed: crosses at x=20
    route_j = planner.generate_route(origin, dest, GraphType.JAYWALKING)
    assert max(w[0][0] for w in route_j) <= 20.0
    crossing_wps = [w for w, c in route_j if c]
    assert len(crossing_wps) == 1 and crossing_wps[0][1] == 10.0


def test_native_matches_python_astar():
    g = city_block_graph()
    native = AStarRouter(g, use_native=True)
    python = AStarRouter(g, use_native=False)
    if not native.native:
        pytest.skip("native astar unavailable")
    rng = np.random.default_rng(3)
    for _ in range(15):
        s, t = rng.integers(0, g.num_nodes, 2)
        for gt in GraphType:
            p_native = native.shortest_path(int(s), int(t), gt)
            p_python = python.shortest_path(int(s), int(t), gt)
            # equal cost (paths may tie); compare total lengths
            assert _path_cost(g, p_native, gt) == pytest.approx(
                _path_cost(g, p_python, gt), rel=1e-9)


def _path_cost(g, path, gt):
    if not path:
        return float("inf")
    offsets, nbr, nbr_len, nbr_type = g.csr()
    total = 0.0
    for a, b in zip(path[:-1], path[1:]):
        found = None
        for i in range(offsets[a], offsets[a + 1]):
            if nbr[i] == b:
                found = nbr_len[i]
                break
        assert found is not None, "invalid edge in path"
        total += found
    return total


def test_unreachable_raises():
    # a sidewalk island connected to the main component only by jaywalking:
    # its nodes are in the NO_JAYWALKING subgraph but unreachable within it
    b = NavGraphBuilder()
    b.add_edge([0, 0, 0], [10, 0, 0], EdgeType.SIDEWALK)
    b.add_edge([100, 100, 0], [110, 100, 0], EdgeType.SIDEWALK)
    b.add_edge([10, 0, 0], [100, 100, 0], EdgeType.JAYWALKING)
    g = b.build()
    planner = PedPathPlanner(g)
    # reachable when jaywalking is allowed ...
    assert planner.generate_route([0, 0, 0], [110, 100, 0], GraphType.JAYWALKING)
    # ... unreachable without it
    with pytest.raises(ValueError):
        planner.generate_route([0, 0, 0], [110, 100, 0], GraphType.NO_JAYWALKING)


def test_route_provider_feeds_scenario(tmp_path):
    """generate_route scenarios build end-to-end via the route provider."""
    from carla_social_force_model_tpu.api.scenario import build_scenario
    g = city_block_graph()
    planner = PedPathPlanner(g)
    scenario = {
        "step_length": 0.05,
        "walker": {"ped_spawner": [{
            "spawn_location": [0.0, 0.0, 1.0],
            "destination": [0.0, 10.0, 0.0],
            "generate_route": "NO_JAYWALKING",
            "speed": 1.4, "quantity": 1,
        }]},
    }
    sfm = {"forces": {"acceleration_force": True}}
    bundle = build_scenario(scenario, sfm, num_steps=10,
                            route_provider=planner.route_provider())
    assert int(bundle.scene.spawn.routes.count[0]) >= 4
    # save/load roundtrip
    g.save_npz(tmp_path / "graph.npz")
    g2 = NavGraph.load_npz(tmp_path / "graph.npz")
    assert g2.num_nodes == g.num_nodes and g2.num_edges == g.num_edges
