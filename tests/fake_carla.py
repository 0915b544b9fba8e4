"""Minimal fake of the CARLA map API (the subset the bridge consumes).

One straight road (road_id=1) along +x with the OpenDRIVE lane layout

    lane_id:  -3 (sidewalk)  -2 (shoulder)  -1 (driving)
               +1 (driving)  +2 (shoulder)  +3 (sidewalk)

Negative lanes travel +x (yaw 0), positive lanes travel -x (yaw 180), and
get_left_lane/get_right_lane follow travel direction (they flip at the
center line), which is exactly the semantics the reference's jaywalking
walk relies on.  One crosswalk crosses the road at x=25.

Installed as ``sys.modules["carla"]`` by :func:`install` so the bridge's
lazy ``import carla`` picks it up in tests.
"""
from __future__ import annotations

import math
import sys
import types

import numpy as np

ROAD_LENGTH = 50.0
LANE_WIDTH = 3.0
#: lane_id -> centerline y
LANE_Y = {-3: -7.5, -2: -4.5, -1: -1.5, 1: 1.5, 2: 4.5, 3: 7.5}
LANE_ORDER = [-3, -2, -1, 1, 2, 3]


class Location:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x, self.y, self.z = float(x), float(y), float(z)

    def distance(self, other):
        return math.dist((self.x, self.y, self.z), (other.x, other.y, other.z))

    def __add__(self, other):
        return Location(self.x + other.x, self.y + other.y, self.z + other.z)

    def __sub__(self, other):
        return Location(self.x - other.x, self.y - other.y, self.z - other.z)

    def __rmul__(self, s):
        return Location(s * self.x, s * self.y, s * self.z)

    def __mul__(self, s):
        return Location(s * self.x, s * self.y, s * self.z)

    def __eq__(self, other):
        return (self.x, self.y, self.z) == (other.x, other.y, other.z)

    def __ne__(self, other):
        return not self.__eq__(other)


Vector3D = Location


class Rotation:
    def __init__(self, pitch=0.0, yaw=0.0, roll=0.0):
        self.pitch, self.yaw, self.roll = pitch, yaw, roll


class Transform:
    def __init__(self, location=None, rotation=None):
        self.location = location or Location()
        self.rotation = rotation or Rotation()

    def get_forward_vector(self):
        r = math.radians(self.rotation.yaw)
        return Location(math.cos(r), math.sin(r), 0.0)

    def transform(self, local):
        r = math.radians(self.rotation.yaw)
        c, s = math.cos(r), math.sin(r)
        return Location(self.location.x + c * local.x - s * local.y,
                        self.location.y + s * local.x + c * local.y,
                        self.location.z + local.z)


class LaneType:
    Driving = "Driving"
    Sidewalk = "Sidewalk"
    Shoulder = "Shoulder"


_LANE_TYPE = {-3: LaneType.Sidewalk, -2: LaneType.Shoulder,
              -1: LaneType.Driving, 1: LaneType.Driving,
              2: LaneType.Shoulder, 3: LaneType.Sidewalk}


class Waypoint:
    _counter = [0]

    def __init__(self, fmap, lane_id, x):
        self._map = fmap
        self.lane_id = lane_id
        self.x = x
        self.road_id = 1
        self.section_id = 0
        self.is_junction = False
        self.lane_type = _LANE_TYPE[lane_id]
        self.lane_width = LANE_WIDTH
        Waypoint._counter[0] += 1
        self.id = Waypoint._counter[0]
        self._yaw = 0.0 if lane_id < 0 else 180.0

    @property
    def transform(self):
        # CARLA returns a fresh Transform copy on every access; the
        # reference's lateral_shift mutates it, relying on exactly that
        return Transform(Location(self.x, LANE_Y[self.lane_id], 0.0),
                         Rotation(0.0, self._yaw, 0.0))

    # -- longitudinal walks (along travel direction) ----------------------
    def next(self, d):
        nx = self.x + d if self.lane_id < 0 else self.x - d
        if 0.0 <= nx <= ROAD_LENGTH:
            return [Waypoint(self._map, self.lane_id, nx)]
        return []

    def previous(self, d):
        nx = self.x - d if self.lane_id < 0 else self.x + d
        if 0.0 <= nx <= ROAD_LENGTH:
            return [Waypoint(self._map, self.lane_id, nx)]
        return []

    def next_until_lane_end(self, d):
        out, wp = [], self
        while True:
            nxt = wp.next(d)
            if not nxt:
                return out
            wp = nxt[0]
            out.append(wp)

    # -- lateral walks (left/right flip with travel direction) ------------
    def _lateral(self, spatial_step):
        idx = LANE_ORDER.index(self.lane_id) + spatial_step
        if 0 <= idx < len(LANE_ORDER):
            return Waypoint(self._map, LANE_ORDER[idx], self.x)
        return None

    def get_left_lane(self):
        # travel +x (negative ids): left is +y (toward larger index);
        # travel -x (positive ids): left is -y
        return self._lateral(+1 if self.lane_id < 0 else -1)

    def get_right_lane(self):
        return self._lateral(-1 if self.lane_id < 0 else +1)

    def get_junction(self):
        return None


class SegmentWaypoint:
    """Waypoint on a free-standing straight lane segment (junction corners).

    No lateral neighbors, so the reference's corner test (no Driving lane on
    either side) classifies these segments as junction corners.
    """

    def __init__(self, start, end, s, road_id, lane_id, is_junction=True,
                 junction=None, lane_type=LaneType.Sidewalk):
        self._start = np.asarray(start, float)
        self._end = np.asarray(end, float)
        self._s = s
        self._len = float(np.linalg.norm(self._end - self._start))
        self.road_id = road_id
        self.section_id = 0
        self.lane_id = lane_id
        self.lane_type = lane_type
        self.lane_width = LANE_WIDTH
        self.is_junction = is_junction
        self._junction = junction
        Waypoint._counter[0] += 1
        self.id = Waypoint._counter[0]

    @property
    def transform(self):
        d = (self._end - self._start) / self._len
        p = self._start + self._s * d
        yaw = math.degrees(math.atan2(d[1], d[0]))
        return Transform(Location(p[0], p[1], 0.0), Rotation(0.0, yaw, 0.0))

    def _at(self, s):
        return SegmentWaypoint(self._start, self._end, s, self.road_id,
                               self.lane_id, self.is_junction, self._junction,
                               self.lane_type)

    def next(self, d):
        ns = self._s + d
        return [self._at(ns)] if ns <= self._len else []

    def previous(self, d):
        ns = self._s - d
        return [self._at(ns)] if ns >= 0.0 else []

    def next_until_lane_end(self, d):
        out, s = [], self._s + d
        while s <= self._len:
            out.append(self._at(s))
            s += d
        return out

    def get_left_lane(self):
        return None

    def get_right_lane(self):
        return None

    def get_junction(self):
        return self._junction


class Junction:
    """4-corner junction: corner sidewalk segments at the corners of a
    square; the reference keeps the 4 shortest corner-connection edges
    (perimeter) and drops the diagonals."""

    def __init__(self, jid=1):
        self.id = jid
        self._corners = []
        # square spanning the road between x=52 and x=58
        for lane_id, (cx, cy) in enumerate(
                [(52.0, -7.5), (58.0, -7.5), (52.0, 7.5), (58.0, 7.5)],
                start=101):
            start = (cx - 2.0, cy)
            end = (cx + 2.0, cy)
            self._corners.append(
                (SegmentWaypoint(start, end, 0.0, road_id=200 + lane_id,
                                 lane_id=lane_id, junction=self),
                 SegmentWaypoint(start, end, 4.0, road_id=200 + lane_id,
                                 lane_id=lane_id, junction=self)))

    def get_waypoints(self, lane_type):
        if lane_type != LaneType.Sidewalk:
            return []
        return list(self._corners)


class CityObjectLabel:
    Static = "Static"
    Poles = "Poles"
    Walls = "Walls"
    Vehicles = "Vehicles"


class BoundingBox:
    def __init__(self, location, extent, rotation=None):
        self.location = location
        self.extent = extent
        self.rotation = rotation or Rotation()

    def get_local_vertices(self):
        """8 corners in CARLA's order (all +-extent combos, z fastest);
        [::2] therefore selects the 4 bottom corners."""
        out = []
        tf = Transform(self.location, self.rotation)
        for sx in (-1, 1):
            for sy in (-1, 1):
                for sz in (-1, 1):
                    out.append(tf.transform(Location(
                        sx * self.extent.x, sy * self.extent.y,
                        sz * self.extent.z)))
        return out


class EnvironmentObject:
    def __init__(self, label, transform, bounding_box):
        self.type = label
        self.transform = transform
        self.bounding_box = bounding_box


class World:
    """Holds environment objects for extraction tests."""

    def __init__(self, objects=()):
        self._objects = list(objects)

    def get_environment_objects(self, label):
        return [o for o in self._objects if o.type == label]


class Map:
    name = "Fake/FakeTown"

    def __init__(self, with_junction: bool = False):
        self._junction = Junction() if with_junction else None

    def get_topology(self):
        # one segment per driving lane (start waypoint, end waypoint)
        topo = [(Waypoint(self, -1, 0.0), Waypoint(self, -1, ROAD_LENGTH)),
                (Waypoint(self, 1, ROAD_LENGTH), Waypoint(self, 1, 0.0))]
        if self._junction is not None:
            # a junction driving segment whose start waypoint discovers it
            j_wp = SegmentWaypoint((52.0, 0.0), (58.0, 0.0), 0.0,
                                   road_id=99, lane_id=-1,
                                   junction=self._junction,
                                   lane_type=LaneType.Driving)
            topo.append((j_wp, j_wp.next(6.0)[0] if j_wp.next(6.0) else j_wp))
        return topo

    def get_crosswalks(self):
        # 4 corners + repeated first corner, crossing the road at x=25
        pts = [Location(24.0, -6.0), Location(26.0, -6.0),
               Location(26.0, 6.0), Location(24.0, 6.0)]
        return pts + [pts[0]]

    def get_waypoint(self, location, lane_type=None):
        candidates = [lid for lid, t in _LANE_TYPE.items()
                      if lane_type is None or t == lane_type]
        lid = min(candidates, key=lambda l: abs(LANE_Y[l] - location.y))
        x = min(max(location.x, 0.0), ROAD_LENGTH)
        return Waypoint(self, lid, x)

    def to_opendrive(self):
        return "<fake-opendrive/>"


# ---------------------------------------------------------------------------
# Generic multi-road town (round-2 recorded-map fixture): polyline roads
# (straight or curved), several junction shapes (4-way with corner segments,
# T-junction with a straight through-sidewalk), crosswalk clusters including
# the 6-corner pattern exercising the reference's 7-point cleanup
# (path_planner.py:354-366).
# ---------------------------------------------------------------------------


class Road:
    """Road along a centerline polyline with the standard 6-lane layout
    (sidewalk/shoulder/driving each side, LANE_Y offsets).  Negative lanes
    travel along the polyline direction, positive lanes against it."""

    def __init__(self, road_id, points):
        self.road_id = road_id
        self.pts = np.asarray(points, float).reshape(-1, 2)
        seg = np.diff(self.pts, axis=0)
        seg_len = np.linalg.norm(seg, axis=1)
        self.cum = np.concatenate([[0.0], np.cumsum(seg_len)])
        self.length = float(self.cum[-1])

    def point_at(self, s):
        """(position (2,), unit direction (2,)) at arc length s (clamped)."""
        s = min(max(s, 0.0), self.length)
        i = int(np.searchsorted(self.cum, s, side="right") - 1)
        i = min(i, len(self.pts) - 2)
        seg = self.pts[i + 1] - self.pts[i]
        seg_len = np.linalg.norm(seg)
        d = seg / seg_len
        return self.pts[i] + d * (s - self.cum[i]), d

    def locate(self, x, y):
        """(arc length s, signed lateral offset) of the closest centerline
        point; positive offset = left of the polyline direction."""
        p = np.array([x, y])
        best = (np.inf, 0.0, 0.0)
        for i in range(len(self.pts) - 1):
            a, b = self.pts[i], self.pts[i + 1]
            seg = b - a
            L = np.linalg.norm(seg)
            t = float(np.clip(np.dot(p - a, seg) / (L * L), 0.0, 1.0))
            q = a + t * seg
            dist = float(np.linalg.norm(p - q))
            if dist < best[0]:
                d = seg / L
                lat = float(-(p - q)[0] * d[1] + (p - q)[1] * d[0])
                best = (dist, self.cum[i] + t * L, lat)
        return best[1], best[2]


class RoadWaypoint:
    """Waypoint on a polyline Road (the multi-road town's Waypoint)."""

    def __init__(self, road: Road, lane_id: int, s: float,
                 is_junction=False, junction=None):
        self._road = road
        self.lane_id = lane_id
        self._s = float(s)
        self.road_id = road.road_id
        self.section_id = 0
        self.is_junction = is_junction
        self._junction = junction
        self.lane_type = _LANE_TYPE[lane_id]
        self.lane_width = LANE_WIDTH
        Waypoint._counter[0] += 1
        self.id = Waypoint._counter[0]

    @property
    def transform(self):
        p, d = self._road.point_at(self._s)
        # left normal of the travel direction; lane offsets follow LANE_Y
        # (positive = left of the polyline direction)
        off = LANE_Y[self.lane_id]
        pos = p + np.array([-d[1], d[0]]) * off
        yaw = math.degrees(math.atan2(d[1], d[0]))
        if self.lane_id > 0:
            yaw += 180.0
        return Transform(Location(pos[0], pos[1], 0.0), Rotation(0.0, yaw, 0.0))

    def _at(self, s):
        if not (0.0 <= s <= self._road.length):
            return None
        return RoadWaypoint(self._road, self.lane_id, s,
                            self.is_junction, self._junction)

    def next(self, d):
        wp = self._at(self._s + d if self.lane_id < 0 else self._s - d)
        return [wp] if wp else []

    def previous(self, d):
        wp = self._at(self._s - d if self.lane_id < 0 else self._s + d)
        return [wp] if wp else []

    def next_until_lane_end(self, d):
        out, wp = [], self
        while True:
            nxt = wp.next(d)
            if not nxt:
                return out
            wp = nxt[0]
            out.append(wp)

    def _lateral(self, step):
        idx = LANE_ORDER.index(self.lane_id) + step
        if 0 <= idx < len(LANE_ORDER):
            return RoadWaypoint(self._road, LANE_ORDER[idx], self._s,
                                self.is_junction, self._junction)
        return None

    def get_left_lane(self):
        return self._lateral(+1 if self.lane_id < 0 else -1)

    def get_right_lane(self):
        return self._lateral(-1 if self.lane_id < 0 else +1)

    def get_junction(self):
        return self._junction


class GenericJunction:
    """Junction from explicit (wp_start, wp_end) sidewalk pairs: corner
    segments (SegmentWaypoint, no lateral neighbors) classify as corners;
    RoadWaypoint pairs on a through road classify as straights (a Driving
    lane exists laterally), exercising path_planner.py:291-306."""

    def __init__(self, jid, corner_segments=(), straight_pairs=()):
        self.id = jid
        self._pairs = []
        for road_id, lane_id, start, end in corner_segments:
            length = float(np.linalg.norm(np.asarray(end, float)
                                          - np.asarray(start, float)))
            self._pairs.append(
                (SegmentWaypoint(start, end, 0.0, road_id=road_id,
                                 lane_id=lane_id, junction=self),
                 SegmentWaypoint(start, end, length, road_id=road_id,
                                 lane_id=lane_id, junction=self)))
        self._pairs.extend(straight_pairs)

    def get_waypoints(self, lane_type):
        if lane_type != LaneType.Sidewalk:
            return []
        return list(self._pairs)


class Town2Map:
    """Multi-road, multi-junction town:

    * road 1: W-E (0,0)->(44,0);   road 2: W-E (56,0)->(100,0)
    * road 3: S-N (50,-50)->(50,-6); road 4: S-N (50,6)->(50,44)
    * 4-way junction J1 at (50,0) with 4 corner segments
    * road 5: S-N (106,-50)->(106,50) past a T-junction J2 at (100,0):
      2 corner segments + the straight through-sidewalk on road 5's far side
    * road 6: quarter-bend (curved polyline) from (50,50) to (100,100)
    * crosswalks: 4-corner on road 1 at x=20 and a 6-corner group on road 3
      at y=-30 (exercising the reference's 6-point cleanup)
    """

    name = "Fake/FakeTown2"

    def __init__(self):
        # curved road: starts exactly at road 4's end with the same heading
        # and a total length that's a multiple of the 10 m waypoint spacing,
        # so its sidewalk chain endpoints merge with road 4's (the node-
        # rounding dedup the reference relies on for contiguous sidewalks)
        bend = [(50.0, 46.0), (50.0, 56.0)]
        for a in np.linspace(np.pi, np.pi / 2, 9)[1:]:
            bend.append((100.0 + 44.0 * np.cos(a), 56.0 + 44.0 * np.sin(a)))
        r6 = Road(6, bend)
        frac = r6.length % 10.0
        if frac > 1e-9:  # extend the last segment to a multiple of 10 m
            d = (r6.pts[-1] - r6.pts[-2])
            d = d / np.linalg.norm(d)
            bend[-1] = tuple(r6.pts[-1] + d * (10.0 - frac))
            r6 = Road(6, bend)
        self.roads = {
            1: Road(1, [(0.0, 0.0), (44.0, 0.0)]),
            2: Road(2, [(56.0, 0.0), (100.0, 0.0)]),
            3: Road(3, [(50.0, -50.0), (50.0, -6.0)]),
            4: Road(4, [(50.0, 6.0), (50.0, 46.0)]),
            5: Road(5, [(106.0, -50.0), (106.0, 50.0)]),
            6: r6,
        }
        # J1: 4-way at (50, 0); corner sidewalk segments connect the exact
        # chain-end node positions of the four adjoining road sidewalks
        # (road 1 S end (40,-7.5) / N end (44,7.5); road 3 W end (42.5,-6) /
        # E end (57.5,-10); road 4 W end (42.5,14) / E end (57.5,6);
        # road 2 S start (56,-7.5) / N start (60,7.5))
        self._j1 = GenericJunction(1, corner_segments=[
            (101, 101, (40.0, -7.5), (42.5, -6.0)),    # SW
            (102, 102, (44.0, 7.5), (42.5, 6.0)),      # NW
            (103, 103, (57.5, -10.0), (56.0, -7.5)),   # SE
            (104, 104, (57.5, 6.0), (60.0, 7.5)),      # NE
        ])
        # J2: T-junction at (100, 0); road 5 runs through N-S, its far-side
        # (east, lane -3 at x=106+7.5... actually lane 3, left of S->N) side
        # walk passes straight through
        r5 = self.roads[5]
        straight = [(RoadWaypoint(r5, -3, 44.0, is_junction=True,
                                  junction=None),
                     RoadWaypoint(r5, -3, 56.0, is_junction=True,
                                  junction=None))]
        self._j2 = GenericJunction(2, corner_segments=[
            (201, 201, (96.0, -7.5), (98.5, -10.0)),   # road2 S -> road5 W
            (202, 202, (100.0, 7.5), (98.5, 10.0)),    # road2 N -> road5 W
        ], straight_pairs=straight)

    def get_topology(self):
        topo = []
        for road in self.roads.values():
            topo.append((RoadWaypoint(road, -1, 0.0),
                         RoadWaypoint(road, -1, road.length)))
            topo.append((RoadWaypoint(road, 1, road.length),
                         RoadWaypoint(road, 1, 0.0)))
        # junction driving stubs so the graph builder discovers J1/J2
        for jid, (a, b), junction in [
                (99, ((44.0, 0.0), (56.0, 0.0)), self._j1),
                (98, ((100.0, 0.0), (106.0, 0.0)), self._j2)]:
            wp = SegmentWaypoint(a, b, 0.0, road_id=jid, lane_id=-1,
                                 junction=junction,
                                 lane_type=LaneType.Driving)
            end = wp.next(1.0)
            topo.append((wp, end[0] if end else wp))
        return topo

    def get_crosswalks(self):
        # off the 10 m waypoint grid so coincident jaywalking edges don't
        # override them (networkx later-edge-wins, which the reference
        # inherits too).  4-corner crosswalk on road 1 at x=25:
        a = [Location(24.0, -6.0), Location(26.0, -6.0),
             Location(26.0, 6.0), Location(24.0, 6.0)]
        # 6-corner group on road 3 at y=-25: reference deletes indices 4 and
        # 1 before pairing (path_planner.py:360-363)
        b = [Location(44.0, -26.0), Location(44.0, -25.0),
             Location(44.0, -24.0), Location(56.0, -24.0),
             Location(56.0, -25.0), Location(56.0, -26.0)]
        return a + [a[0]] + b + [b[0]]

    def get_waypoint(self, location, lane_type=None):
        candidates = [lid for lid, t in _LANE_TYPE.items()
                      if lane_type is None or t == lane_type]
        p = np.array([location.x, location.y])
        best, best_d = None, np.inf
        for road in self.roads.values():
            s, _ = road.locate(location.x, location.y)
            c, d = road.point_at(s)
            normal = np.array([-d[1], d[0]])
            for lid in candidates:
                center = c + normal * LANE_Y[lid]
                dist = float(np.linalg.norm(p - center))
                if dist < best_d:
                    best_d = dist
                    best = RoadWaypoint(road, lid, s)
        return best

    def to_opendrive(self):
        return "<fake-opendrive-town2/>"


class CrossTownMap:
    """Junction-faithful 4-way-junction town: roads are SPLIT at the
    junction polygon like real OpenDRIVE (each approach road ends at the
    junction boundary), so the full sidewalk-border extraction produces no
    wall that crosses another road's sidewalk channel -- unlike Town2Map,
    whose road footprints overlap at junctions (see make_town2_assets.py).
    This is the fixture behind the ``routed_town_walled`` scenario: routing
    over junction corners + crosswalks WITH the extracted borders active.

    * road 11: W approach (0,0)->(40,0);  road 12: E approach (60,0)->(100,0)
    * road 13: S approach (50,-50)->(50,-10); road 14: N (50,10)->(50,50)
    * junction J1 box x in [40,60], y in [-10,10]; 4 corner sidewalk
      segments connect the exact sidewalk chain-end nodes
    * crosswalks: across road 11 at x=25 and across road 13 at y=-25
      (both off the 10 m waypoint grid)
    """

    name = "Fake/CrossTown"

    def __init__(self):
        self.roads = {
            11: Road(11, [(0.0, 0.0), (40.0, 0.0)]),
            12: Road(12, [(60.0, 0.0), (100.0, 0.0)]),
            13: Road(13, [(50.0, -50.0), (50.0, -10.0)]),
            14: Road(14, [(50.0, 10.0), (50.0, 50.0)]),
        }
        # corner endpoints == sidewalk chain-end node positions, so the
        # node-rounding dedup fuses them into the road chains:
        # road 11 ends (40, -7.5)/(40, 7.5); road 12 starts (60, -7.5)/
        # (60, 7.5); road 13 ends (42.5, -10)/(57.5, -10); road 14 starts
        # (42.5, 10)/(57.5, 10)
        self._j1 = GenericJunction(1, corner_segments=[
            (111, 111, (40.0, -7.5), (42.5, -10.0)),   # SW: W <-> S west
            (112, 112, (40.0, 7.5), (42.5, 10.0)),     # NW: W <-> N west
            (113, 113, (57.5, -10.0), (60.0, -7.5)),   # SE: S east <-> E
            (114, 114, (57.5, 10.0), (60.0, 7.5)),     # NE: N east <-> E
        ])

    def get_topology(self):
        topo = []
        for road in self.roads.values():
            topo.append((RoadWaypoint(road, -1, 0.0),
                         RoadWaypoint(road, -1, road.length)))
            topo.append((RoadWaypoint(road, 1, road.length),
                         RoadWaypoint(road, 1, 0.0)))
        wp = SegmentWaypoint((40.0, 0.0), (60.0, 0.0), 0.0, road_id=99,
                             lane_id=-1, junction=self._j1,
                             lane_type=LaneType.Driving)
        end = wp.next(1.0)
        topo.append((wp, end[0] if end else wp))
        return topo

    def get_crosswalks(self):
        a = [Location(24.0, -6.0), Location(26.0, -6.0),
             Location(26.0, 6.0), Location(24.0, 6.0)]
        b = [Location(44.0, -26.0), Location(44.0, -24.0),
             Location(56.0, -24.0), Location(56.0, -26.0)]
        return a + [a[0]] + b + [b[0]]

    get_waypoint = Town2Map.get_waypoint

    def to_opendrive(self):
        return "<fake-opendrive-crosstown/>"


# ---------------------------------------------------------------------------
# Fake CARLA *server*: the client/world/actor/TrafficManager API subset that
# bridge/carla_world.py and bridge/vehicle_spawner.py consume, so the
# otherwise live-only code paths (client setup, batched spawning,
# WalkerControl application, TM knobs, settings restore) execute headless.
# Walkers integrate their commanded velocity over one fixed step (CARLA's
# effective WalkerControl behavior); TM vehicles drive straight along their
# spawn heading at a constant speed.
# ---------------------------------------------------------------------------


class WalkerControl:
    def __init__(self, direction=None, speed=0.0, jump=False):
        self.direction = direction or Vector3D(1.0, 0.0, 0.0)
        self.speed = float(speed)
        self.jump = jump


class VehicleControl:
    """Throttle/steer/brake control (the BehaviorAgent return type).  The
    fake server integrates it kinematically in ``ServerWorld.tick``."""

    def __init__(self, throttle=0.0, steer=0.0, brake=0.0,
                 hand_brake=False, reverse=False):
        self.throttle = float(throttle)
        self.steer = float(steer)
        self.brake = float(brake)
        self.hand_brake = hand_brake
        self.reverse = reverse


class MapLayer:
    Props = "Props"
    StreetLights = "StreetLights"
    Walls = "Walls"
    Foliage = "Foliage"


class WorldSettings:
    def __init__(self):
        self.synchronous_mode = False
        self.deterministic_ragdolls = False
        self.fixed_delta_seconds = None
        self.substepping = False
        self.max_substep_delta_time = 0.0
        self.max_substeps = 0

    def copy(self):
        s = WorldSettings()
        s.__dict__.update(self.__dict__)
        return s


class Blueprint:
    def __init__(self, bp_id, wheels=4):
        self.id = bp_id
        self._attrs = {"role_name": "", "number_of_wheels": wheels}

    def has_attribute(self, name):
        return name in self._attrs

    def set_attribute(self, name, value):
        self._attrs[name] = value

    def get_attribute(self, name):
        return self._attrs[name]


class BlueprintLibrary(list):
    def filter(self, pattern):
        key = pattern.rstrip("*").rstrip(".")
        return BlueprintLibrary(b for b in self if b.id.startswith(key)
                                or key in b.id)

    def find(self, bp_id):
        return next(b for b in self if b.id == bp_id)


class _FakeActor:
    def __init__(self, world, actor_id, blueprint, transform, kind):
        self._world = world
        self.id = actor_id
        self.type_id = blueprint.id
        self.kind = kind                      # "walker" | "vehicle"
        self._transform = transform
        self._velocity = Vector3D(0.0, 0.0, 0.0)
        self._control = None                  # WalkerControl
        self.autopilot = False
        self.tm_speed = 3.0                   # m/s for fake TM driving
        ext = (Location(0.19, 0.19, 0.93) if kind == "walker"
               else Location(2.4, 1.1, 0.75))
        self.bounding_box = BoundingBox(Location(0, 0, 0), ext)
        self.attributes = {}

    # -- common ------------------------------------------------------------
    def get_transform(self):
        return Transform(Location(self._transform.location.x,
                                  self._transform.location.y,
                                  self._transform.location.z),
                         Rotation(0.0, self._transform.rotation.yaw, 0.0))

    def get_location(self):
        return self.get_transform().location

    def get_velocity(self):
        return Vector3D(self._velocity.x, self._velocity.y, self._velocity.z)

    def set_transform(self, tf):
        self._transform = tf

    def set_target_velocity(self, vel):
        self._velocity = vel

    def destroy(self):
        self._world._actors.pop(self.id, None)
        return True

    # -- walker ------------------------------------------------------------
    def apply_control(self, control):
        self._control = control

    # -- vehicle (BehaviorAgent surface minimal) ----------------------------
    def get_world(self):
        return self._world


class TrafficManagerFake:
    def __init__(self, port):
        self.port = port
        self.synchronous = False
        self.seed = None
        self.calls = []   # (method, actor_id, value) for test assertions

    def set_synchronous_mode(self, on):
        self.synchronous = bool(on)

    def set_random_device_seed(self, seed):
        self.seed = int(seed)

    def get_port(self):
        return self.port

    def vehicle_percentage_speed_difference(self, vehicle, value):
        self.calls.append(("speed_difference", vehicle.id, float(value)))

    def ignore_walkers_percentage(self, vehicle, value):
        self.calls.append(("ignore_walkers", vehicle.id, float(value)))

    def ignore_lights_percentage(self, vehicle, value):
        self.calls.append(("ignore_lights", vehicle.id, float(value)))


class ServerWorld:
    """World held by the fake server (walkers + vehicles + clock)."""

    def __init__(self, fmap):
        self._map = fmap
        self._actors = {}
        self._next_id = 1
        self._settings = WorldSettings()
        self._elapsed = 0.0
        self._spectator = _FakeActor(self, 0, Blueprint("spectator"),
                                     Transform(), "spectator")
        self._unloaded_layers = []
        self.pedestrians_seed = None
        # 41-blueprint walker library (CARLA 0.9.13) + a few vehicles
        self._library = BlueprintLibrary(
            [Blueprint(f"walker.pedestrian.{i:04d}") for i in range(1, 42)]
            + [Blueprint("vehicle.audi.tt", 4),
               Blueprint("vehicle.tesla.model3", 4),
               Blueprint("vehicle.harley-davidson.low_rider", 2)])

    # -- queries -------------------------------------------------------------
    def get_map(self):
        return self._map

    def get_settings(self):
        return self._settings.copy()

    def apply_settings(self, settings):
        self._settings = settings.copy()

    def get_blueprint_library(self):
        return self._library

    def get_actor(self, actor_id):
        return self._actors.get(actor_id)

    def get_actors(self):
        class _Actors(list):
            def filter(self, pattern):
                key = pattern.strip("*")
                return [a for a in self if key in a.type_id]
        return _Actors(self._actors.values())

    def get_snapshot(self):
        class TS:
            pass
        class Snap:
            pass
        snap = Snap()
        snap.timestamp = TS()
        snap.timestamp.elapsed_seconds = self._elapsed
        return snap

    def get_spectator(self):
        return self._spectator

    def set_pedestrians_seed(self, seed):
        self.pedestrians_seed = int(seed)
        import random as _random
        self._nav_rng = _random.Random(int(seed))

    def get_random_location_from_navigation(self):
        """Random point on some sidewalk lane (server-side RNG, seeded by
        set_pedestrians_seed like CARLA's)."""
        rng = getattr(self, "_nav_rng", None)
        if rng is None:
            import random as _random
            rng = self._nav_rng = _random.Random(0)
        m = self._map
        roads = list(getattr(m, "roads", {1: None}).values())
        if roads[0] is None:   # single straight road map
            x = rng.uniform(0.0, ROAD_LENGTH)
            y = LANE_Y[rng.choice([-3, 3])] + rng.uniform(-1.0, 1.0)
            return Location(x, y, 0.1)
        road = rng.choice(roads)
        s = rng.uniform(0.0, road.length)
        p, d = road.point_at(s)
        off = LANE_Y[rng.choice([-3, 3])] + rng.uniform(-1.0, 1.0)
        pos = p + np.array([-d[1], d[0]]) * off
        return Location(pos[0], pos[1], 0.1)

    def unload_map_layer(self, layer):
        self._unloaded_layers.append(layer)

    def get_environment_objects(self, label):
        return []

    # -- debug ---------------------------------------------------------------
    @property
    def debug(self):
        class _Debug:
            def draw_point(self, *a, **k):
                pass

            def draw_box(self, *a, **k):
                pass

            def draw_line(self, *a, **k):
                pass
        return _Debug()

    # -- stepping ------------------------------------------------------------
    def _spawn(self, blueprint, transform, kind):
        actor = _FakeActor(self, self._next_id, blueprint, transform, kind)
        self._actors[self._next_id] = actor
        self._next_id += 1
        return actor

    def tick(self):
        dt = self._settings.fixed_delta_seconds or 0.05
        for a in list(self._actors.values()):
            if a.kind == "walker" and a._control is not None:
                c = a._control
                a._velocity = Vector3D(c.direction.x * c.speed,
                                       c.direction.y * c.speed,
                                       c.direction.z * c.speed)
                a._transform.location = Location(
                    a._transform.location.x + a._velocity.x * dt,
                    a._transform.location.y + a._velocity.y * dt,
                    a._transform.location.z)
            elif a.kind == "vehicle" and a.autopilot:
                fwd = a.get_transform().get_forward_vector()
                a._velocity = fwd * a.tm_speed
                a._transform.location = (a._transform.location
                                         + a._velocity * dt)
            elif a.kind == "vehicle" and isinstance(a._control,
                                                    VehicleControl):
                # agent-driven vehicle: integrate throttle/steer/brake
                # kinematically (enough dynamics to exercise the
                # BehaviorAgent bridge branch)
                c = a._control
                a._speed = getattr(a, "_speed", 0.0)
                a._speed = max(0.0, a._speed + (c.throttle * 3.0
                                                - c.brake * 8.0) * dt)
                a._transform.rotation.yaw += c.steer * 60.0 * dt
                fwd = a.get_transform().get_forward_vector()
                a._velocity = fwd * a._speed
                a._transform.location = (a._transform.location
                                         + a._velocity * dt)
            elif a.kind == "vehicle":
                # scripted vehicles are teleported by the bridge; integrate
                # target velocity holders not at all
                pass
        self._elapsed += dt
        return self._elapsed


class _SpawnActorCmd:
    def __init__(self, blueprint, transform):
        self.blueprint = blueprint
        self.transform = transform
        self.autopilot = None   # (enabled, port) when chained

    def then(self, set_autopilot_cmd):
        self.autopilot = (set_autopilot_cmd.enabled, set_autopilot_cmd.port)
        return self


class _SetAutopilotCmd:
    def __init__(self, actor, enabled, port=8000):
        self.enabled = bool(enabled)
        self.port = port


class _FutureActor:
    pass


command = types.SimpleNamespace(SpawnActor=_SpawnActorCmd,
                                SetAutopilot=_SetAutopilotCmd,
                                FutureActor=_FutureActor)


class _Response:
    def __init__(self, actor_id, error=""):
        self.actor_id = actor_id
        self.error = error

    def has_error(self):
        return bool(self.error)


class Client:
    """Fake server entry point (carla.Client(host, port))."""

    _server_world = None      # set by install_server()
    fail_walker_spawns = set()
    _walker_spawn_count = 0

    def __init__(self, host="localhost", port=2000):
        self.host, self.port = host, port
        self._tms = {}

    def set_timeout(self, t):
        self.timeout = t

    def get_world(self):
        return Client._server_world

    def load_world(self, name):
        return Client._server_world

    def get_trafficmanager(self, port=8000):
        if port not in self._tms:
            self._tms[port] = TrafficManagerFake(port)
        return self._tms[port]

    def apply_batch_sync(self, batch, do_tick=False):
        responses = []
        for cmd in batch:
            if not isinstance(cmd, _SpawnActorCmd):
                responses.append(_Response(0, "unsupported command"))
                continue
            kind = ("walker" if cmd.blueprint.id.startswith("walker")
                    else "vehicle")
            if kind == "walker":
                idx = Client._walker_spawn_count
                Client._walker_spawn_count += 1
                if idx in Client.fail_walker_spawns:
                    responses.append(_Response(0, "collision at spawn"))
                    continue
            actor = Client._server_world._spawn(cmd.blueprint, cmd.transform,
                                                kind)
            if cmd.autopilot is not None and cmd.autopilot[0]:
                actor.autopilot = True
            responses.append(_Response(actor.id))
        return responses


def install_server(fmap=None):
    """Install the module as ``carla`` with a live fake server; returns
    (map, ServerWorld)."""
    install()
    m = fmap if fmap is not None else Map()
    # get_spawn_points for the vehicle manager
    if not hasattr(type(m), "get_spawn_points"):
        type(m).get_spawn_points = lambda self: [
            Transform(Location(10.0, 0.0, 0.3), Rotation(0.0, 0.0, 0.0)),
            Transform(Location(40.0, 0.0, 0.3), Rotation(0.0, 180.0, 0.0))]
    world = ServerWorld(m)
    Client._server_world = world
    Client.fail_walker_spawns = set()
    Client._walker_spawn_count = 0
    return m, world


class BehaviorAgent:
    """Fake ``agents.navigation.behavior_agent.BehaviorAgent``: steers the
    vehicle toward the destination with throttle/steer VehicleControls (the
    subset the bridge's agent branch consumes,
    bridge/vehicle_spawner.py:127-135)."""

    def __init__(self, vehicle, behavior="normal"):
        self.vehicle = vehicle
        self.behavior = behavior
        self._dest = None
        self._ignore_lights = False
        self.run_steps = 0

    def set_destination(self, end_location, start_location=None):
        self._dest = end_location

    def ignore_traffic_lights(self, active=True):
        self._ignore_lights = bool(active)

    def done(self):
        if self._dest is None:
            return True
        return self.vehicle.get_location().distance(self._dest) < 3.0

    def run_step(self, debug=False):
        self.run_steps += 1
        if self.done():
            return VehicleControl(brake=1.0)
        tf = self.vehicle.get_transform()
        dx = self._dest.x - tf.location.x
        dy = self._dest.y - tf.location.y
        want = math.degrees(math.atan2(dy, dx))
        err = (want - tf.rotation.yaw + 180.0) % 360.0 - 180.0
        return VehicleControl(throttle=0.75,
                              steer=max(-1.0, min(1.0, err / 45.0)))


def install_agents():
    """Register fake ``agents.navigation.behavior_agent`` modules so the
    bridge's BehaviorAgent branch imports headless."""
    pkg = types.ModuleType("agents")
    nav = types.ModuleType("agents.navigation")
    ba = types.ModuleType("agents.navigation.behavior_agent")
    ba.BehaviorAgent = BehaviorAgent
    pkg.navigation = nav
    nav.behavior_agent = ba
    sys.modules["agents"] = pkg
    sys.modules["agents.navigation"] = nav
    sys.modules["agents.navigation.behavior_agent"] = ba
    return ba


def install():
    """Register this module as ``carla`` in sys.modules; returns the Map."""
    mod = types.ModuleType("carla")
    for name, obj in globals().items():
        if not name.startswith("_"):
            setattr(mod, name, obj)
    sys.modules["carla"] = mod
    return Map()


def install_town2():
    """Install the module as ``carla`` and return the multi-road town."""
    install()
    return Town2Map()


def install_crosstown():
    """Install the module as ``carla`` and return the split-road
    4-way-junction town (junction-faithful borders)."""
    install()
    return CrossTownMap()
