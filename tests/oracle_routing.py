"""Reference-transliterated routing oracle (networkx).

Independent re-expression of the reference's PedPathPlanner pipeline
(/root/reference/path_planner.py) used ONLY as a test oracle, the routing
counterpart of tests/oracle.py: topology generation (:210-344), crosswalk
cleanup + connections (:346-406), graph build with the rounded-xyz id_map and
``road_id_to_edge`` index (:438-501), jaywalking-edge generation with the
index-based opposite snap (:503-562), subgraph filtering (:564-588), A*
search with euclidean heuristic, index-based nearest-node lookup (:103-143)
and detour-removing start/end pruning (:154-172).

Runs against the fake CARLA map API (tests/fake_carla.py), so route parity
between the engine's array-backed planner and the reference's algorithm is
checkable headless on multi-road, multi-junction topologies.
"""
from __future__ import annotations

import itertools

import numpy as np
import networkx as nx

from carla_social_force_model_tpu.routing.graph import EdgeType, GraphType


def _xyz(wp):
    loc = wp.transform.location
    return np.array([loc.x, loc.y, loc.z])


def _key(wp):
    return tuple(np.round(_xyz(wp), 0))


class RoutingOracle:
    def __init__(self, carla_map, waypoint_distance=10.0,
                 jaywalking_weight_factor=2.0):
        import carla
        self.carla = carla
        self.carla_map = carla_map
        self.waypoint_distance = waypoint_distance
        self.jw = jaywalking_weight_factor
        self.topology = []       # edge dicts: entry/exit wp, type
        self._build_topology()
        self.graph = nx.Graph()
        self.id_map = {}
        self.road_id_to_edge = {}
        self._add_edges(self.topology)
        self._add_edges(self._jaywalking_edges())
        self.subgraphs = self._subgraphs()

    # -- topology -----------------------------------------------------------
    def _edge_dicts(self, wps, edge_type):
        out = []
        for a, b in zip(wps[:-1], wps[1:]):
            out.append({"entry": a, "exit": b, "type": edge_type,
                        "length": float(np.linalg.norm(_xyz(a) - _xyz(b)))})
        return out

    def _build_topology(self):
        carla = self.carla
        topo = self.carla_map.get_topology()
        all_junctions, seen = [], set()
        for seg in topo:
            w = seg[0]
            segment_wps = [w]
            if not w.is_junction:
                segment_wps += w.next_until_lane_end(self.waypoint_distance)
            else:
                j = w.get_junction()
                if j is not None and j.id not in seen:
                    all_junctions.append(j)
                    seen.add(j.id)
            left, right = {}, {}
            for wp in segment_wps:
                lane = wp.get_left_lane()
                while lane and lane.lane_type != carla.LaneType.Driving:
                    if lane.lane_type == carla.LaneType.Sidewalk:
                        left.setdefault(lane.lane_id, []).append(lane)
                    lane = lane.get_left_lane()
                lane = wp.get_right_lane()
                while lane and lane.lane_type != carla.LaneType.Driving:
                    if lane.lane_type == carla.LaneType.Sidewalk:
                        right.setdefault(lane.lane_id, []).append(lane)
                    lane = lane.get_right_lane()
            for side in (left, right):
                for chain in side.values():
                    self.topology += self._edge_dicts(chain, EdgeType.SIDEWALK)

        for junction in all_junctions:
            corners, straights = [], []
            for wp_start, wp_end in junction.get_waypoints(
                    carla.LaneType.Sidewalk):
                is_corner = True
                lane = wp_start.get_left_lane()
                while lane and is_corner:
                    if lane.lane_type == carla.LaneType.Driving:
                        is_corner = False
                    lane = lane.get_left_lane()
                lane = wp_start.get_right_lane()
                while lane and is_corner:
                    if lane.lane_type == carla.LaneType.Driving:
                        is_corner = False
                    lane = lane.get_right_lane()
                if is_corner:
                    chain = wp_start.next_until_lane_end(0.5)
                    mid = chain[len(chain) // 2]
                    self.topology += self._edge_dicts(
                        [wp_start, mid, wp_end], EdgeType.SIDEWALK)
                    corners.append(mid)
                else:
                    wp1 = wp_start.next(wp_start.lane_width)[0]
                    wp2 = wp_end.previous(wp_start.lane_width)[0]
                    straights += self._edge_dicts(
                        [wp_start, wp1, wp2, wp_end], EdgeType.SIDEWALK)
                    corners += [wp1, wp2]
            conn, lengths = [], []
            for a, b in itertools.combinations(corners, 2):
                e = self._edge_dicts([a, b], EdgeType.JAYWALKING_JUNCTION)
                conn += e
                lengths.append(e[0]["length"])
            if len(corners) == 4:
                keep = np.argpartition(lengths, 4)[:4]
                conn = [conn[i] for i in keep]
            self.topology += conn
            self.topology += straights   # after connections: type override

        # crosswalks (5/7-point cleanup)
        pts, current = [], []
        for p in self.carla_map.get_crosswalks():
            if p not in current:
                current.append(p)
            else:
                if len(current) == 4:
                    pts += current
                elif len(current) == 6:
                    del current[4]
                    del current[1]
                    pts += current
                current = []
        cross_edges = []
        if pts:
            arr = np.array([[p.x, p.y, p.z] for p in pts]).reshape(-1, 2, 2, 3)
            for crosswalk in arr:
                ends = []
                for side in crosswalk:
                    mid = (side[0] + side[1]) / 2.0
                    wp = self.carla_map.get_waypoint(
                        carla.Location(float(mid[0]), float(mid[1]),
                                       float(mid[2])),
                        lane_type=carla.LaneType.Shoulder)
                    if wp is not None:
                        ends.append(wp)
                cross_edges += self._edge_dicts(ends, EdgeType.CROSSWALK)
        topo_wps = [w for e in self.topology for w in (e["entry"], e["exit"])]
        conn_edges = []
        for e in cross_edges:
            for wp in (e["entry"], e["exit"]):
                loc = wp.transform.location
                for n in topo_wps:
                    if (n.road_id == wp.road_id
                            and loc.distance(n.transform.location) < 10.0):
                        conn_edges += self._edge_dicts([wp, n],
                                                       EdgeType.SIDEWALK)
        self.topology += conn_edges
        self.topology += cross_edges

    # -- graph ---------------------------------------------------------------
    def _add_edges(self, edge_dicts):
        for e in edge_dicts:
            entry, exit_ = e["entry"], e["exit"]
            k1, k2 = _key(entry), _key(exit_)
            length = e["length"]
            if e["type"] in (EdgeType.JAYWALKING,
                             EdgeType.JAYWALKING_JUNCTION):
                length *= self.jw
            for k, wp in ((k1, entry), (k2, exit_)):
                if k not in self.id_map:
                    self.id_map[k] = len(self.id_map)
                    self.graph.add_node(self.id_map[k], xyz=np.array(k),
                                        waypoint=wp)
            n1, n2 = self.id_map[k1], self.id_map[k2]
            if n1 == n2:
                continue
            rsl = (entry.road_id, entry.section_id, entry.lane_id)
            self.road_id_to_edge.setdefault(rsl[0], {}).setdefault(
                rsl[1], {}).setdefault(rsl[2], []).append((n1, n2))
            self.graph.add_edge(n1, n2, length=length, type=e["type"],
                                entry_waypoint=entry, exit_waypoint=exit_)

    def _jaywalking_edges(self):
        carla = self.carla
        out = []
        for e in self.topology:
            for wp in (e["entry"], e["exit"]):
                if wp.lane_type != carla.LaneType.Sidewalk:
                    continue
                opp = self._opposite_sidewalk(wp)
                if opp is None:
                    continue
                opp_id = self._closest_node_id(opp.transform.location)
                if opp_id is None:
                    continue
                opp_wp = self.graph.nodes[opp_id]["waypoint"]
                opp_sh = self.carla_map.get_waypoint(
                    opp_wp.transform.location,
                    lane_type=carla.LaneType.Shoulder)
                sh = self.carla_map.get_waypoint(
                    wp.transform.location, lane_type=carla.LaneType.Shoulder)
                if sh is None or opp_sh is None:
                    continue
                out += self._edge_dicts([wp, sh], EdgeType.SIDEWALK_TO_ROAD)
                out += self._edge_dicts([opp_wp, opp_sh],
                                        EdgeType.SIDEWALK_TO_ROAD)
                out += self._edge_dicts([sh, opp_sh], EdgeType.JAYWALKING)
        return out

    def _opposite_sidewalk(self, wp):
        carla = self.carla
        sign = np.sign(wp.lane_id)
        for first in ("left", "right"):
            lane = (wp.get_left_lane() if first == "left"
                    else wp.get_right_lane())
            while lane is not None:
                if lane.lane_type == carla.LaneType.Sidewalk:
                    return lane
                same = np.sign(lane.lane_id) == sign
                if first == "left":
                    lane = (lane.get_left_lane() if same
                            else lane.get_right_lane())
                else:
                    lane = (lane.get_right_lane() if same
                            else lane.get_left_lane())
        return None

    def _closest_node_id(self, location):
        carla = self.carla
        wp = self.carla_map.get_waypoint(location,
                                         lane_type=carla.LaneType.Sidewalk)
        if wp is None:
            return None
        try:
            edges = self.road_id_to_edge[wp.road_id][wp.section_id][wp.lane_id]
        except KeyError:
            return None
        best, best_d = None, np.inf
        for edge in edges:
            for i, attr in enumerate(("entry_waypoint", "exit_waypoint")):
                other = self.graph.edges[edge][attr]
                d = wp.transform.location.distance(other.transform.location)
                if d < best_d:
                    best, best_d = edge[i], d
        return best

    def id_map_inv(self, node_id):
        """Exact xyz of the node's first-registered waypoint."""
        return _xyz(self.graph.nodes[node_id]["waypoint"])

    def _subgraphs(self):
        def filter_out(g, t):
            keep = [(a, b) for a, b, d in g.edges.data() if d["type"] != t]
            return g.edge_subgraph(keep)

        tmp = filter_out(self.graph, EdgeType.JAYWALKING)
        at_junction = filter_out(tmp, EdgeType.SIDEWALK_TO_ROAD)
        none = filter_out(at_junction, EdgeType.JAYWALKING_JUNCTION)
        return {GraphType.JAYWALKING: self.graph,
                GraphType.JAYWALKING_AT_JUNCTION: at_junction,
                GraphType.NO_JAYWALKING: none}

    # -- routing -------------------------------------------------------------
    def generate_route(self, origin, destination, graph_type,
                       with_origin=False):
        carla = self.carla
        origin = np.asarray(origin, float)
        destination = np.asarray(destination, float)
        g = self.subgraphs[graph_type]
        o_loc = carla.Location(*[float(v) for v in origin[:3]])
        d_loc = carla.Location(*[float(v) for v in destination[:3]])
        start = self._closest_node_id(o_loc)
        end = self._closest_node_id(d_loc)

        def h(a, b):
            return float(np.linalg.norm(
                _xyz(self.graph.nodes[a]["waypoint"])
                - _xyz(self.graph.nodes[b]["waypoint"])))

        path = nx.astar_path(g, start, end, heuristic=h, weight="length")

        # detour-removing start/end pruning (:154-172), in place like the ref
        if len(path) > 1:
            first = _xyz(self.graph.nodes[path[0]]["waypoint"])
            second = _xyz(self.graph.nodes[path[1]]["waypoint"])
            last = _xyz(self.graph.nodes[path[-1]]["waypoint"])
            second_last = _xyz(self.graph.nodes[path[-2]]["waypoint"])
            if (np.linalg.norm(first - second)
                    > np.linalg.norm(origin[:3] - second)):
                del path[0]
            if len(path) > 1 and (np.linalg.norm(last - second_last)
                                  > np.linalg.norm(destination[:3]
                                                   - second_last)):
                del path[-1]

        route = []
        if with_origin:
            route.append((origin[:3].copy(), False))
        for i in range(len(path) - 1):
            edge = g.edges[(path[i], path[i + 1])]
            crossing = edge["type"] in (EdgeType.CROSSWALK,
                                        EdgeType.JAYWALKING,
                                        EdgeType.JAYWALKING_JUNCTION)
            if i == 0:
                route.append(
                    (_xyz(self.graph.nodes[path[0]]["waypoint"]), False))
            route.append(
                (_xyz(self.graph.nodes[path[i + 1]]["waypoint"]), crossing))
        route.append((destination[:3].copy(), False))
        return route
