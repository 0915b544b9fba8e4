"""Tick-synchronized bridge runner (the reference's SimulationRunner role).

Couples the on-device SFM core (models.stepper.tick_core) to an external
world (CARLA or the in-process fake) with the reference's per-tick contract
(run_simulation.py:47-132):

  spawn due walkers -> world.tick() -> read back walker loc/vel ->
  read back vehicles -> SFM core -> push WalkerControl velocities ->
  waypoint arrival / despawn

The world owns position integration (exactly like CARLA in the reference);
the device owns forces, FSM, gap acceptance and waypoint bookkeeping.
Host<->device traffic per tick is O(N) floats each way.
"""
from __future__ import annotations

import dataclasses
import logging
import random

import numpy as np
import jax
import jax.numpy as jnp

from ..api.scenario import extract_ped_spawners
from ..env.borders import borders_from_config, build_border_set
from ..env.obstacles_gen import build_obstacle_set, static_obstacles_from_config
from ..models import modes
from ..models.params import SfmParams
from ..models.routes import build_route_buffer
from ..models.spawn import SpawnSchedule, SpawnerSpec
from ..models.state import PedState
from ..models.stepper import Scene, StepConfig, tick_core
from ..models.vehicles import VehicleSnapshot, ellipse_template
from ..utils.config import load_config
from .world import World

log = logging.getLogger(__name__)


class _SpawnerRuntime:
    """Host-side greedy spawner timing (pedestrian_spawner.py:46-59,218-228)."""

    def __init__(self, spec: SpawnerSpec):
        self.spec = spec
        self.next_time = spec.spawn_time
        self.remaining = spec.quantity
        self.speed = float(spec.speed)  # mutated cumulatively by jitter

    def ready(self, sim_time: float) -> bool:
        if self.remaining > 0 and self.next_time <= sim_time:
            self.next_time += self.spec.spawn_interval
            self.remaining -= 1
            return True
        return False


class BridgeRunner:
    """Run a scenario against a World adapter, one tick at a time."""

    def __init__(self, world: World, scenario_config, sfm_config,
                 strict_parity: bool = False, route_provider=None,
                 max_vehicles: int = 16, extra_borders=None,
                 extra_border_sections=None, extra_obstacles=None,
                 extra_obstacle_centers=None, extra_ped_specs=None):
        self.world = world
        scenario = load_config(scenario_config)
        sfm = load_config(sfm_config)
        self.scenario_name = scenario.get("scenario_name", "")
        self.params = SfmParams.from_dict(sfm, strict_parity=strict_parity)
        walker = scenario.get("walker", {})
        self.cfg = StepConfig(
            dt=float(scenario.get("step_length", 0.05)),
            waypoint_threshold=float(walker.get("waypoint_threshold", 2.0)),
            despawn_on_arrival=bool(walker.get("despawn_on_arrival", True)))

        obstacles_cfg = scenario.get("obstacles")
        lines, centers, lengths = borders_from_config(obstacles_cfg)
        if extra_borders:
            lines += list(extra_borders)
            for c, l in extra_border_sections or []:
                centers.append(np.asarray(c, np.float64))
                lengths.append(float(l))
        self.border_lines = lines
        borders = build_border_set(lines, centers, lengths)

        outlines, ocenters = static_obstacles_from_config(obstacles_cfg)
        if extra_obstacles:
            outlines += list(extra_obstacles)
            ocenters += [np.asarray(c) for c in (extra_obstacle_centers or [])]
        self.obstacle_outlines, self.obstacle_centers = outlines, ocenters
        static_obstacles = build_obstacle_set(
            outlines, ocenters, self.params.static_obstacle.perception_threshold)
        static_vel = (jnp.zeros((static_obstacles.num_segments, 2), jnp.float32)
                      if static_obstacles is not None else None)

        specs = extract_ped_spawners(scenario, route_provider=route_provider)
        if extra_ped_specs:
            specs = specs + list(extra_ped_specs)
        self.spawners = [_SpawnerRuntime(s) for s in specs]
        self.capacity = max(1, sum(s.quantity for s in specs))
        self.ped_seed = int(walker.get("pedestrian_seed", 2000))
        self.variate_speed = float(walker.get("variate_speed", 0.0))
        # blueprint library size for the seeded per-walker draw: the world's
        # actual library unless the scenario overrides it
        bc = walker.get("blueprint_count")
        self.blueprint_count = (int(bc) if bc is not None
                                else world.walker_blueprint_count())
        self.draw_bounding_boxes = bool(walker.get("draw_bounding_boxes", False))
        self.draw_obstacles = bool(
            scenario.get("map", {}).get("draw_obstacles", False))
        self.spectator_focus = walker.get("spectator_focus")

        # route buffer sized for all slots (filled at spawn time)
        w_max = max([1] + [len(s.waypoints) for s in specs])
        self._routes_wp = np.zeros((self.capacity, w_max, 2), np.float32)
        self._routes_cr = np.zeros((self.capacity, w_max), bool)
        self._routes_cnt = np.zeros((self.capacity,), np.int32)

        # host mirrors of PedState
        self.h = {f.name: np.asarray(getattr(PedState.empty(self.capacity), f.name))
                  .copy() for f in dataclasses.fields(PedState)}
        self.slot_actor = np.full((self.capacity,), -1, np.int64)
        self.slot_name = [None] * self.capacity
        self._next_slot = 0   # advances only on successful spawns
        self._ped_index = 0   # advances on every attempt (reference naming)

        self.max_vehicles = max_vehicles
        self._veh_resolution = float((obstacles_cfg or {}).get("resolution", 0.1))
        self._veh_template_pts = 128
        self._veh_templates: dict[int, np.ndarray] = {}

        from ..models.stepper import prepare_scene
        self._scene_geom = prepare_scene(Scene(
            spawn=self._dummy_schedule(), borders=borders,
            static_obstacles=static_obstacles, static_obstacle_vel=static_vel,
            vehicles=None), analytic=self.cfg.env_analytic,
            orca=self.params.enable_orca)
        self._core = jax.jit(self._core_fn)
        self.history = []     # per-tick StepRecord snapshots (numpy)
        self.veh_history = []  # per-tick list of VehicleObs

        # startup obstacle drawing (reference run_simulation.py:194-197:
        # all static border + obstacle outline points, 30 s lifetime)
        if self.draw_obstacles:
            for line in self.border_lines:
                self.world.draw_points(np.asarray(line), 30.0)
            for outline in self.obstacle_outlines:
                self.world.draw_points(np.asarray(outline), 30.0)

    # ------------------------------------------------------------------
    def _dummy_schedule(self) -> SpawnSchedule:
        """Routes live in the scene for tick_core's waypoint advance."""
        z = jnp.zeros((self.capacity,), jnp.float32)
        return SpawnSchedule(
            step=jnp.full((self.capacity,), -1, jnp.int32),
            pos_x=z, pos_y=z, vel_x=z, vel_y=z,
            speed=z, crossing_speed=z, margin=z, radius=z,
            initial_mode=jnp.zeros((self.capacity,), jnp.int32),
            fwp_x=z, fwp_y=z,
            routes=build_route_buffer([], [], capacity=self.capacity))

    def _core_fn(self, state, routes_wp, routes_cr, routes_cnt, snap, sim_time):
        scene = dataclasses.replace(
            self._scene_geom,
            spawn=dataclasses.replace(
                self._scene_geom.spawn,
                routes=dataclasses.replace(
                    self._scene_geom.spawn.routes,
                    wp_x=routes_wp[..., 0], wp_y=routes_wp[..., 1],
                    crossing=routes_cr, count=routes_cnt)))
        return tick_core(state, scene, self.params, self.cfg, sim_time, snap)

    # ------------------------------------------------------------------
    def _spawn_due(self, sim_time: float):
        self.spawners = [s for s in self.spawners if s.remaining > 0]
        for s in self.spawners:
            if not s.ready(sim_time):
                continue
            spec = s.spec
            name = f"ped_{self._ped_index}"
            self._ped_index += 1

            # per-walker seeded draws in the reference's order
            # (pedestrian_spawner.py:133-150): seed, blueprint choice (only
            # when none is configured), speed jitter, seed increment --
            # performed whether or not the world spawn succeeds.
            rng = random.Random()
            rng.seed(self.ped_seed)
            bp = spec.blueprint
            if not bp and self.blueprint_count > 0:
                bp = rng.choice(range(self.blueprint_count))
            if self.variate_speed != 0.0:
                s.speed += rng.uniform(-self.variate_speed, self.variate_speed)
            self.ped_seed += 1

            wps = np.asarray(spec.waypoints, np.float64)[:, :2]
            loc = np.asarray(spec.spawn_location, np.float64)[:2]
            direction = wps[0] - loc
            yaw = float(np.arctan2(direction[1], direction[0]))
            actor_id = self.world.spawn_walker(bp, loc, yaw, role_name=name)
            if actor_id == -1:
                # failed spawns burn a seed + a name but never a state slot
                # (reference pedestrian_spawner.py:152-153 just skips)
                log.info("Failed to spawn pedestrian %s.", name)
                continue
            slot = self._next_slot
            self._next_slot += 1

            flags = list(spec.crossing_road) or [False] * len(wps)
            k = min(len(wps), len(flags))
            self._routes_wp[slot, :k] = wps[:k]
            self._routes_cr[slot, :k] = flags[:k]
            self._routes_cnt[slot] = k

            h = self.h
            h["pos_x"][slot], h["pos_y"][slot] = loc
            nrm = np.linalg.norm(direction)
            v0 = (direction / nrm * s.speed) if nrm > 0 else np.zeros(2)
            h["vel_x"][slot], h["vel_y"][slot] = v0
            h["radius"][slot] = self.world.get_walker_radius(actor_id)
            h["base_speed"][slot] = s.speed
            h["crossing_speed"][slot] = spec.crossing_speed_factor * s.speed
            h["safety_margin"][slot] = spec.crossing_safety_margin
            h["fsm_target"][slot] = s.speed
            h["applied_target"][slot] = s.speed
            h["mode"][slot] = (modes.CROSSING_ROAD if (flags and flags[0])
                               else modes.WALKING_SIDEWALK)
            h["next_mode_time"][slot] = -1.0
            h["wp_x"][slot], h["wp_y"][slot] = wps[0]
            h["waypoint_idx"][slot] = 0
            h["alive"][slot] = True
            h["spawned"][slot] = True
            self.slot_actor[slot] = actor_id
            self.slot_name[slot] = name
            if self.spectator_focus == name:
                self.world.focus_spectator_on(actor_id)
            log.info("Spawned pedestrian %s.", name)

    def _vehicle_snapshot(self) -> VehicleSnapshot:
        obs = self.world.get_vehicles()
        self.veh_history.append(obs)
        v = self.max_vehicles
        p = self._veh_template_pts
        center = np.zeros((v, 2), np.float32)
        vel = np.zeros((v, 2), np.float32)
        heading = np.zeros((v,), np.float32)
        extent = np.zeros((v, 2), np.float32)
        active = np.zeros((v,), bool)
        template = np.full((v, p, 2), 1.0e8, np.float32)
        template_valid = np.zeros((v, p), bool)
        for i, o in enumerate(obs[:v]):
            if o.actor_id not in self._veh_templates:
                self._veh_templates[o.actor_id] = ellipse_template(
                    float(o.extent[0]), float(o.extent[1]), self._veh_resolution)
            tmpl = self._veh_templates[o.actor_id][:p]
            if self.draw_obstacles:
                # per-tick dynamic-obstacle outline drawing
                # (reference run_simulation.py:97-99)
                c, s = np.cos(o.heading), np.sin(o.heading)
                pts = tmpl @ np.array([[c, s], [-s, c]]) + o.center
                self.world.draw_points(pts, self.cfg.dt)
            center[i] = o.center
            vel[i] = o.velocity
            heading[i] = o.heading
            extent[i] = o.extent
            active[i] = True
            template[i, : len(tmpl)] = tmpl
            template_valid[i, : len(tmpl)] = True
        return VehicleSnapshot(
            center=jnp.asarray(center), vel=jnp.asarray(vel),
            heading=jnp.asarray(heading), extent=jnp.asarray(extent),
            active=jnp.asarray(active), template=jnp.asarray(template),
            template_valid=jnp.asarray(template_valid),
            points_per_chunk=128)

    # ------------------------------------------------------------------
    def tick(self):
        """One synchronized step (reference SimulationRunner.tick order)."""
        sim_time = self.world.get_sim_time()
        self._spawn_due(sim_time)
        self.world.tick()

        h = self.h
        for slot in np.nonzero(h["alive"])[0]:
            loc, vel = self.world.get_walker_state(int(self.slot_actor[slot]))
            h["pos_x"][slot], h["pos_y"][slot] = loc[:2]
            h["vel_x"][slot], h["vel_y"][slot] = vel[:2]
            if self.draw_bounding_boxes:
                self.world.draw_bounding_box(int(self.slot_actor[slot]),
                                             self.cfg.dt)

        snap = self._vehicle_snapshot()
        state = PedState(**{k: jnp.asarray(v) for k, v in h.items()})
        state2, v_new, finished, record = self._core(
            state, jnp.asarray(self._routes_wp), jnp.asarray(self._routes_cr),
            jnp.asarray(self._routes_cnt), snap,
            jnp.asarray(sim_time, jnp.float32))

        v_np = np.stack([np.asarray(v_new[0]), np.asarray(v_new[1])],
                        axis=-1)
        for slot in np.nonzero(h["alive"])[0]:
            v = v_np[slot]
            speed = float(np.linalg.norm(v))
            direction = v / speed if speed != 0.0 else v
            self.world.set_walker_velocity(
                int(self.slot_actor[slot]), np.r_[direction, 0.0], speed)

        # persist FSM/waypoint outputs
        for name in ("mode", "fsm_target", "applied_target", "next_mode_time",
                     "wp_x", "wp_y", "waypoint_idx"):
            h[name][...] = np.asarray(getattr(state2, name))

        fin = np.asarray(finished)
        if self.cfg.despawn_on_arrival:
            for slot in np.nonzero(fin & h["alive"])[0]:
                self.world.destroy_actor(int(self.slot_actor[slot]))
                h["alive"][slot] = False
                log.info("Despawned pedestrian %s.", self.slot_name[slot])

        # record is the planar RecordXY; store the assembled snapshot
        self.history.append((
            np.stack([np.asarray(record.pos_x), np.asarray(record.pos_y)],
                     axis=-1),
            np.stack([np.asarray(record.vel_x), np.asarray(record.vel_y)],
                     axis=-1),
            np.asarray(record.mode), np.asarray(record.alive)))

    def run(self, num_steps: int):
        for _ in range(num_steps):
            self.tick()

    # ------------------------------------------------------------------
    def records(self):
        """History as a StepRecord of stacked arrays (CSV-writer input)."""
        from ..models.stepper import StepRecord
        if not self.history:
            return None
        pos, vel, mode, alive = zip(*self.history)
        return StepRecord(pos=np.stack(pos), vel=np.stack(vel),
                          mode=np.stack(mode), alive=np.stack(alive))
