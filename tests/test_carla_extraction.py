"""Bridge map-extraction and CARLA nav-graph construction on the fake map.

These modules normally need a live CARLA server; the fake implements the
exact API subset they consume (tests/fake_carla.py), so their topology
walks, lateral-lane logic and caching run headless.
"""
import numpy as np
import pytest

import fake_carla

from carla_social_force_model_tpu.routing.graph import EdgeType, GraphType


@pytest.fixture()
def fmap(tmp_path, monkeypatch):
    m = fake_carla.install()
    # content-addressed caches write under cwd/cache by default
    monkeypatch.chdir(tmp_path)
    return m


def test_extract_sidewalk_fake_map(fmap):
    from carla_social_force_model_tpu.bridge.extract import extract_sidewalk
    lines, centers, lengths = extract_sidewalk(fmap, resolution=1.0)
    # two topology segments x one sidewalk group each x two borders
    assert len(lines) == 4
    for line in lines:
        line = np.asarray(line)
        assert len(line) >= 40           # ~50m at 1m resolution
        # borders are lateral shifts of sidewalk centerlines: y near
        # +-(7.5 +- 1.5)
        assert np.all((np.abs(np.abs(line[:, 1]) - 6.0) < 1e-6)
                      | (np.abs(np.abs(line[:, 1]) - 9.0) < 1e-6))
    # cached second call returns identical geometry
    lines2, centers2, lengths2 = extract_sidewalk(fmap, resolution=1.0)
    assert len(lines2) == len(lines)
    np.testing.assert_allclose(np.asarray(lines2[0]), np.asarray(lines[0]))


def _env_world():
    import carla
    objs = [
        # parked car: bbox centered on the transform -> transform path
        carla.EnvironmentObject(
            carla.CityObjectLabel.Static,
            carla.Transform(carla.Location(10.0, -12.0, 0.0)),
            carla.BoundingBox(carla.Location(10.0, -12.0, 0.0),
                              carla.Location(2.0, 1.0, 0.7))),
        # bent streetlight: bbox center far from the pole base -> bbox path,
        # pole extent = min(x, y) on both axes
        carla.EnvironmentObject(
            carla.CityObjectLabel.Poles,
            carla.Transform(carla.Location(30.0, -12.0, 0.0)),
            carla.BoundingBox(carla.Location(34.5, -12.0, 0.0),
                              carla.Location(3.0, 0.3, 0.2))),
        # overhead sign: bottom above the z cutoff -> filtered out
        carla.EnvironmentObject(
            carla.CityObjectLabel.Static,
            carla.Transform(carla.Location(40.0, -12.0, 5.0)),
            carla.BoundingBox(carla.Location(40.0, -12.0, 5.0),
                              carla.Location(1.0, 1.0, 0.2))),
    ]
    return carla.World(objs)


def test_extract_obstacles_ellipse_mode(fmap):
    from carla_social_force_model_tpu.bridge.extract import extract_obstacles
    outlines, centers = extract_obstacles(_env_world(), resolution=0.1,
                                          ellipse_shape=True,
                                          max_obstacle_z_pos=0.3)
    assert len(outlines) == 2  # overhead sign filtered
    car, pole = outlines
    # car ellipse centered on its transform, radii extent*sqrt(2)
    np.testing.assert_allclose(centers[0], [10.0, -12.0])
    local = np.asarray(car) - np.asarray(centers[0])
    assert np.isclose(np.abs(local[:, 0]).max(), 2.0 * np.sqrt(2), rtol=0.05)
    assert np.isclose(np.abs(local[:, 1]).max(), 1.0 * np.sqrt(2), rtol=0.05)
    # pole: circular outline (min extent both axes) around the bbox center
    np.testing.assert_allclose(centers[1], [34.5, -12.0])
    r = np.linalg.norm(np.asarray(pole) - np.asarray(centers[1]), axis=1)
    np.testing.assert_allclose(r, 0.3 * np.sqrt(2), rtol=1e-6)


def test_extract_obstacles_rectangle_mode(fmap):
    from carla_social_force_model_tpu.bridge.extract import extract_obstacles
    outlines, centers = extract_obstacles(_env_world(), resolution=0.5,
                                          ellipse_shape=False,
                                          max_obstacle_z_pos=0.3)
    assert len(outlines) == 2
    # rectangle mode samples the 4 bottom edges of the car bbox
    local = np.asarray(outlines[0]) - np.asarray(centers[0])
    on_x = np.isclose(np.abs(local[:, 0]), 2.0, atol=1e-6)
    on_y = np.isclose(np.abs(local[:, 1]), 1.0, atol=1e-6)
    assert (on_x | on_y).all()


def test_junction_graph_and_sidewalk_extraction(tmp_path, monkeypatch):
    """Junction corner paths: corner edges, 4-shortest connection filter
    (perimeter kept, diagonals dropped), extract_sidewalk junction branch."""
    import fake_carla as fc
    fc.install()
    monkeypatch.chdir(tmp_path)
    fmap_j = fc.Map(with_junction=True)

    from carla_social_force_model_tpu.bridge.extract import extract_sidewalk
    from carla_social_force_model_tpu.routing.carla_graph import (
        build_carla_nav_graph)

    # sidewalk extraction picks up the 4 junction corner segments too
    lines, centers, lengths = extract_sidewalk(fmap_j, resolution=1.0)
    assert len(lines) == 4 + 8  # 4 road borders + 2 per corner segment

    graph = build_carla_nav_graph(fmap_j, waypoint_distance=10.0,
                                  jaywalking_weight_factor=2.0)
    jj = graph.edge_type == int(EdgeType.JAYWALKING_JUNCTION)
    assert jj.sum() == 4, f"4 perimeter corner connections, got {jj.sum()}"
    # diagonals were dropped: all kept connection edges are axis-aligned
    for u, v in zip(graph.edge_u[jj], graph.edge_v[jj]):
        d = np.abs(graph.nodes[u] - graph.nodes[v])
        assert min(d[0], d[1]) < 1e-6, "diagonal connection survived"
    # corner sidewalk edges exist around the corner middles
    sw = graph.edge_type == int(EdgeType.SIDEWALK)
    assert sw.sum() > 10


def test_build_carla_nav_graph_fake_map(fmap):
    from carla_social_force_model_tpu.routing.carla_graph import (
        build_carla_nav_graph)
    from carla_social_force_model_tpu.routing.planner import PedPathPlanner

    graph = build_carla_nav_graph(fmap, waypoint_distance=10.0,
                                  jaywalking_weight_factor=2.0)
    types_present = set(graph.edge_type.tolist())
    assert int(EdgeType.SIDEWALK) in types_present
    assert int(EdgeType.CROSSWALK) in types_present
    assert int(EdgeType.JAYWALKING) in types_present
    assert int(EdgeType.SIDEWALK_TO_ROAD) in types_present

    planner = PedPathPlanner(graph)
    # route across the road without jaywalking -> must use the crosswalk
    route = planner.generate_route([2.0, -7.5, 0.0], [2.0, 7.5, 0.0],
                                   GraphType.NO_JAYWALKING)
    xs = [w[0][0] for w in route]
    assert any(c for _, c in route), "crossing flag missing"
    assert 20.0 <= max(xs) <= 30.0, f"should detour via crosswalk x=25: {xs}"
    # jaywalking allowed -> crosses directly near the origin x
    route_j = planner.generate_route([2.0, -7.5, 0.0], [2.0, 7.5, 0.0],
                                     GraphType.JAYWALKING)
    assert max(w[0][0] for w in route_j) < 20.0
    # second build hits the nav-graph cache
    graph2 = build_carla_nav_graph(fmap, waypoint_distance=10.0,
                                   jaywalking_weight_factor=2.0)
    assert graph2.num_edges == graph.num_edges


def test_road_index_nearest_node(fmap):
    """Origin/destination snapping must use the reference's
    road/section/lane edge index (path_planner.py:119-143): a point near the
    road center snaps to the sidewalk lane the map assigns it to, even when
    a euclidean-nearest graph node (e.g. a crosswalk shoulder node) is
    closer."""
    from carla_social_force_model_tpu.routing.carla_graph import (
        build_carla_nav_graph, make_waypoint_locator)
    from carla_social_force_model_tpu.routing.planner import PedPathPlanner

    graph = build_carla_nav_graph(fmap, waypoint_distance=10.0,
                                  jaywalking_weight_factor=2.0)
    assert graph.edge_rsl is not None
    # the sidewalk lanes of the fake road are indexed
    idx = graph.road_index()
    assert (1, 0, -3) in idx and (1, 0, 3) in idx

    planner = PedPathPlanner(
        graph, waypoint_locator=make_waypoint_locator(fmap))

    # near the crosswalk at x=25, just south of the centerline: euclidean
    # nearest node is a shoulder/crosswalk node (y = +-4.5), but the map
    # assigns the point to sidewalk lane -3 (y = -7.5)
    loc = np.array([25.5, -1.0, 0.0])
    n_ref = planner.nearest_node(loc, GraphType.NO_JAYWALKING)
    n_euc = planner.router.nearest_node(loc, GraphType.NO_JAYWALKING)
    assert abs(graph.nodes[n_ref][1] + 7.5) < 1.0, graph.nodes[n_ref]
    assert n_ref != n_euc
    # and the reference index picks the node closest to the *snapped*
    # waypoint (25.5, -7.5) among lane -3's edge endpoints
    lane_nodes = set()
    for e in idx[(1, 0, -3)]:
        lane_nodes.add(int(graph.edge_u[e]))
        lane_nodes.add(int(graph.edge_v[e]))
    best = min(lane_nodes, key=lambda n: np.linalg.norm(
        graph.nodes[n] - np.array([25.5, -7.5, 0.0])))
    assert n_ref == best

    # a full route built with the locator starts on the assigned sidewalk
    route = planner.generate_route([25.5, -1.0, 0.0], [2.0, -7.5, 0.0],
                                   GraphType.NO_JAYWALKING)
    ys = [w[0][1] for w in route]
    assert all(y < 0 for y in ys[1:-1] if abs(y) > 5.0) or len(route) <= 2

    # npz round-trip keeps the index
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.npz")
        graph.save_npz(p)
        from carla_social_force_model_tpu.routing.graph import NavGraph
        g2 = NavGraph.load_npz(p)
        assert g2.edge_rsl is not None
        assert (1, 0, -3) in g2.road_index()
