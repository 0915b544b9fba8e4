"""Headless float64 reference simulator (oracle for whole-tick parity).

Implements the reference's per-tick pipeline (SURVEY.md section 3.2/3.3) in
plain Python + numpy with one FSM object per pedestrian, mirroring
/root/reference/pedestrian_simulation.py, ped_mode_manager.py and
run_simulation.py ordering:

  spawn -> apply target speeds -> IDLE tick -> gap check -> record ->
  forces -> v' = cap(v + dt F) -> waypoint arrival/despawn -> x += dt v'

(The final Euler step is the headless stand-in for CARLA applying the
commanded WalkerControl velocity for one fixed step.)
"""
from __future__ import annotations

import numpy as np

import oracle
from oracle import IDLE, WALKING, CROSSING, ROAD_TO_SIDEWALK, CHECKING

WAITING_TIME = 5.0


class Fsm:
    def __init__(self, base_speed, initial_mode, crossing_speed_factor, margin):
        self.base_speed = base_speed
        self.crossing_speed = crossing_speed_factor * base_speed
        self.margin = margin
        self.target_speed = base_speed  # even for initial CROSSING (quirk)
        self.mode = initial_mode
        self.next_mode_time = -1.0

    def tick(self, sim_time):
        if self.mode == IDLE and self.next_mode_time <= sim_time:
            self._activate(WALKING, sim_time)

    def set_mode(self, new_mode, sim_time):
        if self.mode == WALKING and new_mode == CROSSING:
            self._activate(CHECKING, sim_time)
        elif self.mode == CROSSING and new_mode == WALKING:
            self._activate(ROAD_TO_SIDEWALK, sim_time)
        else:
            self._activate(new_mode, sim_time)

    def _activate(self, mode, sim_time):
        if mode == IDLE:
            self.target_speed = 0.0
            self.next_mode_time = sim_time + WAITING_TIME
        elif mode == WALKING:
            self.target_speed = self.base_speed
        elif mode == CROSSING:
            self.target_speed = self.crossing_speed
        elif mode == CHECKING:
            self.target_speed = 0.0
        # ROAD_TO_SIDEWALK keeps the previous target speed
        self.mode = mode


class Ped:
    def __init__(self, name, pos, vel, speed, radius, waypoints, crossings,
                 crossing_speed_factor, margin):
        self.name = name
        self.pos = np.asarray(pos, float).copy()
        self.vel = np.asarray(vel, float).copy()
        self.radius = radius
        self.waypoints = [np.asarray(w, float) for w in waypoints]
        self.crossings = list(crossings)
        self.wp_index = 0
        initial = CROSSING if (self.crossings and self.crossings[0]) else WALKING
        self.fsm = Fsm(speed, initial, crossing_speed_factor, margin)
        self.applied_target = speed

    @property
    def waypoint(self):
        return self.waypoints[self.wp_index]


class Spawner:
    def __init__(self, spec):
        self.spec = spec
        self.next_time = spec["spawn_time"]
        self.remaining = spec["quantity"]


class OracleSim:
    def __init__(self, params, dt=0.05, waypoint_threshold=2.0,
                 despawn_on_arrival=True, borders=None, border_centers=None,
                 border_lengths=None, obstacles=None, obstacle_centers=None,
                 vehicle_timeline=None, use_radius=False):
        """params: dict of force param dicts + enable flags (engine-agnostic)."""
        self.p = params
        self.dt = dt
        self.threshold = waypoint_threshold
        self.despawn = despawn_on_arrival
        self.borders = borders or []
        self.border_centers = border_centers
        self.border_lengths = border_lengths
        self.obstacles = obstacles or []
        self.obstacle_centers = obstacle_centers
        self.vehicles = vehicle_timeline  # fn(step) -> (centers, vels, exts, outlines) or None
        self.use_radius = use_radius
        self.spawners: list[Spawner] = []
        self.peds: list[Ped] = []
        self.history = []
        self._ped_count = 0

    def add_spawner(self, **spec):
        spec.setdefault("spawn_time", 0.0)
        spec.setdefault("spawn_interval", 3.0)
        spec.setdefault("quantity", 1)
        spec.setdefault("speed", 1.2)
        spec.setdefault("crossing_speed_factor", 1.5)
        spec.setdefault("crossing_safety_margin", 1.5)
        spec.setdefault("radius", 0.3)
        self.spawners.append(Spawner(spec))

    def _spawn_due(self, sim_time):
        self.spawners = [s for s in self.spawners if s.remaining > 0]
        for s in self.spawners:
            if s.next_time <= sim_time:
                s.next_time += s.spec["spawn_interval"]
                s.remaining -= 1
                spec = s.spec
                wps = [np.asarray(w, float)[:2] for w in spec["waypoints"]]
                crossings = spec.get("crossing_road", [False] * len(wps))
                loc = np.asarray(spec["spawn_location"], float)[:2]
                d = wps[0] - loc
                n = np.linalg.norm(d)
                vel = d / n * spec["speed"] if n > 0 else np.zeros(2)
                self.peds.append(Ped(
                    f"ped_{self._ped_count}", loc, vel, spec["speed"],
                    spec["radius"], wps, crossings,
                    spec["crossing_speed_factor"], spec["crossing_safety_margin"]))
                self._ped_count += 1

    def step(self, t_idx):
        sim_time = t_idx * self.dt
        self._spawn_due(sim_time)
        peds = self.peds
        if not peds:
            self.history.append([])
            return

        # applied target speeds captured before transitions
        for ped in peds:
            ped.applied_target = ped.fsm.target_speed
        for ped in peds:
            ped.fsm.tick(sim_time)

        veh = self.vehicles(t_idx) if self.vehicles else None
        for ped in peds:
            if ped.fsm.mode == CHECKING:
                ready = True
                if veh is not None and len(veh[0]):
                    centers, vels, exts, _ = veh
                    ready = oracle.gap_acceptance_ready(
                        ped.pos, ped.waypoint, ped.fsm.crossing_speed,
                        ped.fsm.margin, centers, vels, exts[:, 0])
                if ready:
                    ped.fsm.set_mode(CROSSING, sim_time)

        self.history.append([
            (ped.name, ped.pos.copy(), ped.vel.copy(), ped.fsm.mode)
            for ped in peds])

        pos = np.array([p.pos for p in peds])
        vel = np.array([p.vel for p in peds])
        radius = np.array([p.radius for p in peds])
        mode = np.array([p.fsm.mode for p in peds])
        waypoint = np.array([p.waypoint for p in peds])
        target = np.array([p.applied_target for p in peds])
        alive = np.ones(len(peds), bool)

        F = np.zeros((len(peds), 2))
        pp = self.p
        if pp.get("acceleration"):
            F += oracle.acceleration_force(pos, vel, waypoint, target,
                                           pp["acceleration"]["tau"])
        if pp.get("pedestrian"):
            c = pp["pedestrian"]
            F += oracle.pedestrian_force(pos, vel, radius, alive, c["lambda"],
                                         c["A"], c["gamma"], c["n"],
                                         c["n_prime"], c["epsilon"],
                                         use_radius=self.use_radius)
        if pp.get("border") and self.borders:
            c = pp["border"]
            F += oracle.border_force(pos, mode, radius, alive, self.borders,
                                     self.border_centers, self.border_lengths,
                                     c["a"], c["b"], use_radius=self.use_radius)
        if pp.get("static_obstacle") and self.obstacles:
            c = pp["static_obstacle"]
            F += oracle.obstacle_force(
                pos, vel, radius, alive, self.obstacles, self.obstacle_centers,
                np.zeros((len(self.obstacles), 2)), c["lambda"], c["A"],
                c["gamma"], c["n"], c["n_prime"], c["epsilon"],
                c["perception_threshold"], use_radius=self.use_radius)
        if pp.get("dynamic_obstacle") and veh is not None and len(veh[0]):
            centers, vels, exts, outlines = veh
            c = pp["dynamic_obstacle"]
            F += oracle.obstacle_force(
                pos, vel, radius, alive, outlines, centers, vels, c["lambda"],
                c["A"], c["gamma"], c["n"], c["n_prime"], c["epsilon"],
                c["perception_threshold"], use_radius=self.use_radius)

        max_speed = target * self.p.get("max_speed_factor", 1.3)
        v_new = oracle.cap_velocity(vel + self.dt * F, max_speed)

        survivors = []
        for i, ped in enumerate(peds):
            dist = np.linalg.norm(ped.waypoint - ped.pos)
            if dist < self.threshold:
                if ped.wp_index + 1 < min(len(ped.waypoints), len(ped.crossings)):
                    ped.wp_index += 1
                    want = CROSSING if ped.crossings[ped.wp_index] else WALKING
                    ped.fsm.set_mode(want, sim_time)
                elif self.despawn:
                    continue  # despawned
            ped.vel = v_new[i]
            ped.pos = ped.pos + self.dt * ped.vel
            survivors.append(ped)
        self.peds = survivors

    def run(self, num_steps):
        for t in range(num_steps):
            self.step(t)
        return self.history
