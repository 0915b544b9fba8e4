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


def install():
    """Register this module as ``carla`` in sys.modules; returns the Map."""
    mod = types.ModuleType("carla")
    for name, obj in globals().items():
        if not name.startswith("_"):
            setattr(mod, name, obj)
    sys.modules["carla"] = mod
    return Map()
