"""Deterministic spawn schedules, precomputed host-side.

The reference's spawner timing is fully deterministic (one readiness check
per spawner per tick, one spawn per check; pedestrian_spawner.py:46-59,
:218-228), so the entire spawn schedule of a rollout is computable up front.
Each pedestrian occupies a fixed slot; on device, spawning is a masked
write-at-slot when the rollout reaches the slot's spawn step.

The seeded per-walker randomness (blueprint choice + speed jitter,
pedestrian_spawner.py:133-150) is replicated host-side with Python's
``random`` in the same call order, including the reference's cumulative
spawner-speed mutation (``ped_spawner.target_speed += uniform(...)`` mutates
the *spawner*, so jitter accumulates across walkers of one spawner).
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from . import modes
from .routes import RouteBuffer, build_route_buffer
from ..ops.vecmath import stack_xy

#: pair-force model families selectable per spawner (``pair_force`` key);
#: ids index SpawnSchedule.law_id and the stepper's family row masks
LAW_IDS = {"moussaid": 0, "powerlaw": 1, "helbing": 2, "orca": 3}
from .state import PedState

# Size of CARLA 0.9.13's walker blueprint library (walker.pedestrian.0001 ..
# .0041; the reference pins carla==0.9.13 in requirements.txt:1).  The
# reference's seeded per-walker `random.choice(walker_blueprints)`
# (pedestrian_spawner.py:133-138) consumes RNG entropy that depends only on
# the library size, so emulating the draw with the right count makes the
# subsequent speed-jitter draw match the reference bit-for-bit.  Override
# with the `walker.blueprint_count` scenario key for other CARLA versions.
WALKER_BLUEPRINT_COUNT = 41


@dataclass
class SpawnerSpec:
    """Host-side description of one ``[[walker.ped_spawner]]`` entry."""

    spawn_location: np.ndarray          # (2,) or (3,) - z ignored
    waypoints: np.ndarray               # (W, 2/3) including final destination
    crossing_road: Sequence[bool]       # aligned with waypoints
    speed: float = 1.2
    blueprint: str | None = None
    quantity: int = 1
    spawn_time: float = 0.0
    spawn_interval: float = 3.0
    crossing_speed_factor: float = 1.5
    crossing_safety_margin: float = 1.5
    radius: float = 0.3                 # headless substitute for CARLA bbox
    #: social-group size (Moussaid-2010 group forces, models/groups.py):
    #: consecutive walkers of this spawner form groups of this many members
    #: (0/1 = no groups).  Beyond-reference capability.
    group_size: int = 0
    #: per-agent pair-interaction sensitivity (beyond-reference crowd
    #: heterogeneity): scales the pedestrian-interaction force each walker
    #: FEELS (row-wise F_i *= s_i after the pairwise sum, so it composes
    #: exactly with every kernel path incl. the Newton's-third-law and
    #: ring launches).  0 = oblivious (others still avoid it), 1 =
    #: reference behavior.
    interaction_scale: float = 1.0
    #: uniform +-jitter half-width on interaction_scale, drawn per walker
    #: from a DEDICATED seeded stream (never perturbs the reference's
    #: blueprint/speed draw parity)
    variate_interaction: float = 0.0
    #: per-agent pair-force model family (mixed-model crowds): "moussaid",
    #: "powerlaw", or "helbing" restricts THIS spawner's walkers to
    #: perceiving the crowd through that one family (the family must be
    #: enabled in ``[forces]``); None (default) = the walker feels every
    #: enabled family, the homogeneous behavior.  Row-masked after the
    #: pairwise sum, so it composes with every kernel path.
    pair_force: str | None = None


@pytree_dataclass
class SpawnSchedule:
    """Per-slot spawn data; ``step == -1`` means the slot is never used.

    Coordinates are x/y planes, not ``(N, 2)`` (see models/state.py on the
    TPU size-2-minor layout rule); the ``pos`` / ``vel`` /
    ``first_waypoint`` properties assemble host-side views.
    """

    step: jnp.ndarray            # (N,) int32 realized spawn step
    pos_x: jnp.ndarray           # (N,)
    pos_y: jnp.ndarray
    vel_x: jnp.ndarray           # (N,) initial velocity (toward first wp)
    vel_y: jnp.ndarray
    speed: jnp.ndarray           # (N,) target walking speed (jittered)
    crossing_speed: jnp.ndarray  # (N,)
    margin: jnp.ndarray          # (N,) gap-acceptance safety margin
    radius: jnp.ndarray          # (N,)
    initial_mode: jnp.ndarray    # (N,) int32
    fwp_x: jnp.ndarray           # (N,) first waypoint
    fwp_y: jnp.ndarray
    routes: RouteBuffer
    #: (N,) int32 social-group id per slot, -1 = ungrouped (spawner
    #: ``group_size`` chunks; models/groups.py).  HOST-side metadata: the
    #: device-consumed structure is the GroupSet member table the scenario
    #: builder derives from it (build_groups) BEFORE any capacity padding.
    group_id: jnp.ndarray | None = None
    #: (N,) f32 per-agent pair-interaction sensitivity (None = homogeneous
    #: 1.0 -- the reference behavior; see SpawnerSpec.interaction_scale).
    #: Slot-static, so it lives in scene data, not the scan carry; shards
    #: with the slots.
    pair_scale: jnp.ndarray | None = None
    #: (N,) int32 per-agent pair-force family (LAW_IDS; -1 = every enabled
    #: family -- the homogeneous default).  None when no spawner sets
    #: ``pair_force``.  Slot-static scene data like pair_scale.
    law_id: jnp.ndarray | None = None

    @property
    def capacity(self) -> int:
        return self.step.shape[0]

    @property
    def pos(self) -> jnp.ndarray:
        return stack_xy(self.pos_x, self.pos_y)

    @property
    def vel(self) -> jnp.ndarray:
        return stack_xy(self.vel_x, self.vel_y)

    @property
    def first_waypoint(self) -> jnp.ndarray:
        return stack_xy(self.fwp_x, self.fwp_y)


def realized_spawn_steps(spawn_time: float, spawn_interval: float,
                         quantity: int, dt: float, num_steps: int) -> list[int]:
    """Replicates the greedy one-spawn-per-tick readiness loop."""
    steps = []
    next_time = spawn_time
    remaining = quantity
    for step in range(num_steps):
        if remaining <= 0:
            break
        if next_time <= step * dt:
            steps.append(step)
            next_time += spawn_interval
            remaining -= 1
    return steps


def build_spawn_schedule(
    spawners: Sequence[SpawnerSpec],
    dt: float,
    num_steps: int,
    pedestrian_seed: int = 2000,
    variate_speed: float = 0.0,
    blueprint_count: int = WALKER_BLUEPRINT_COUNT,
    initial_velocity: str = "forward",
    dtype=np.float32,
) -> SpawnSchedule:
    """Expand spawner specs into a flat per-slot schedule.

    Slot order is the reference's spawn order: ticks ascending, spawners in
    config order within a tick (matching the ``ped_<index>`` naming,
    pedestrian_spawner.py:176-183).

    ``blueprint_count``: size of the walker blueprint library to emulate for
    seeded-randomness parity; 0 skips the blueprint draw (the value is only
    observable headless through the entropy it consumes before the speed
    jitter draw).  Defaults to CARLA 0.9.13's library size so headless
    ``variate_speed`` jitter matches what the reference would produce for
    the same seed out of the box.

    ``initial_velocity``: ``"forward"`` gives new pedestrians their declared
    initial velocity toward the first waypoint (the reference's initial SFM
    state, pedestrian_spawner.py:215-216); ``"zero"`` reproduces what the
    reference actually simulates with CARLA attached, where the first
    readback overwrites that velocity with the fresh walker's ~zero velocity
    (run_simulation.py:78-87) -- use it to match bridge runs exactly.
    """
    # per-spawner realized steps
    per_spawner = [
        realized_spawn_steps(s.spawn_time, s.spawn_interval, s.quantity, dt, num_steps)
        for s in spawners
    ]
    # (step, spawner_idx, occurrence) in reference spawn order
    events: list[tuple[int, int]] = []
    cursor = [0] * len(spawners)
    for step in range(num_steps):
        for si, steps in enumerate(per_spawner):
            if cursor[si] < len(steps) and steps[cursor[si]] == step:
                events.append((step, si))
                cursor[si] += 1

    n = max(1, len(events))
    step_arr = np.full((n,), -1, np.int32)
    pos = np.zeros((n, 2), dtype)
    vel = np.zeros((n, 2), dtype)
    speed = np.zeros((n,), dtype)
    crossing_speed = np.zeros((n,), dtype)
    margin = np.zeros((n,), dtype)
    radius = np.zeros((n,), dtype)
    initial_mode = np.full((n,), modes.WALKING_SIDEWALK, np.int32)
    first_wp = np.zeros((n, 2), dtype)
    routes: list[np.ndarray] = []
    crossings: list[list[bool]] = []

    ped_seed = pedestrian_seed
    spawner_speed = [float(s.speed) for s in spawners]  # mutated cumulatively

    # social-group assignment (models/groups.py): a spawner with
    # group_size > 1 chunks ITS walkers, in spawn order, into consecutive
    # groups; ids are globally unique across spawners.  A trailing
    # partial chunk (including a singleton) keeps its id -- the group
    # force masks <2-member groups to zero.
    group_arr = np.full((n,), -1, np.int32)
    # per-agent interaction sensitivity: jitter draws come from a DEDICATED
    # stream (np Generator, not the reference-parity random.Random chain)
    # so enabling heterogeneity never shifts the seeded blueprint/speed
    # draw order the parity tests pin
    scale_arr = np.ones((n,), dtype)
    scale_rng = np.random.default_rng(pedestrian_seed)
    law_arr = np.full((n,), -1, np.int32)
    for s in spawners:
        if s.pair_force is not None and s.pair_force not in LAW_IDS:
            raise ValueError(
                f"pair_force must be one of {sorted(LAW_IDS)}, "
                f"got {s.pair_force!r}")
    spawn_counter = [0] * len(spawners)
    group_base = [0] * len(spawners)
    next_base = 0
    for si, s in enumerate(spawners):
        group_base[si] = next_base
        if s.group_size > 1:
            next_base += -(-len(per_spawner[si]) // s.group_size)

    for slot, (step, si) in enumerate(events):
        s = spawners[si]
        rng = random.Random()
        rng.seed(ped_seed)
        if not s.blueprint and blueprint_count > 0:
            rng.choice(range(blueprint_count))  # consume the blueprint draw
        if variate_speed != 0.0:
            spawner_speed[si] += rng.uniform(-variate_speed, variate_speed)
        ped_seed += 1

        wps = np.asarray(s.waypoints, dtype)[:, :2].reshape(-1, 2)
        flags = list(s.crossing_road)
        loc = np.asarray(s.spawn_location, dtype)[:2]
        direction = wps[0] - loc
        nrm = np.linalg.norm(direction)
        direction = direction / nrm if nrm > 0 else np.zeros(2)

        step_arr[slot] = step
        pos[slot] = loc
        if initial_velocity == "forward":
            vel[slot] = direction * spawner_speed[si]
        speed[slot] = spawner_speed[si]
        crossing_speed[slot] = s.crossing_speed_factor * spawner_speed[si]
        margin[slot] = s.crossing_safety_margin
        radius[slot] = s.radius
        initial_mode[slot] = (
            modes.CROSSING_ROAD if (flags and flags[0]) else modes.WALKING_SIDEWALK
        )
        first_wp[slot] = wps[0]
        routes.append(wps)
        crossings.append(flags if flags else [False] * len(wps))
        if s.group_size > 1:
            group_arr[slot] = (group_base[si]
                               + spawn_counter[si] // s.group_size)
        scale_arr[slot] = s.interaction_scale
        if s.variate_interaction != 0.0:
            scale_arr[slot] += scale_rng.uniform(-s.variate_interaction,
                                                 s.variate_interaction)
        if s.pair_force is not None:
            law_arr[slot] = LAW_IDS[s.pair_force]
        spawn_counter[si] += 1

    route_buffer = build_route_buffer(routes, crossings, capacity=n)
    return SpawnSchedule(
        step=jnp.asarray(step_arr),
        pos_x=jnp.asarray(pos[:, 0]), pos_y=jnp.asarray(pos[:, 1]),
        vel_x=jnp.asarray(vel[:, 0]), vel_y=jnp.asarray(vel[:, 1]),
        speed=jnp.asarray(speed), crossing_speed=jnp.asarray(crossing_speed),
        margin=jnp.asarray(margin), radius=jnp.asarray(radius),
        initial_mode=jnp.asarray(initial_mode),
        fwp_x=jnp.asarray(first_wp[:, 0]), fwp_y=jnp.asarray(first_wp[:, 1]),
        routes=route_buffer,
        group_id=(jnp.asarray(group_arr) if (group_arr >= 0).any() else None),
        pair_scale=(jnp.asarray(scale_arr) if (scale_arr != 1.0).any()
                    else None),
        law_id=(jnp.asarray(law_arr) if (law_arr >= 0).any() else None),
    )


def apply_spawn(state: PedState, schedule: SpawnSchedule, t_idx) -> PedState:
    """Activate slots whose spawn step is ``t_idx`` (masked write-at-slot).

    Initial FSM state replicates PedModeManager.__init__ (reference :18-28):
    the target speed starts at the walking speed even when the initial mode
    is CROSSING_ROAD (no _activate_mode call on construction).
    """
    newly = (schedule.step == t_idx) & ~state.spawned

    def sel(new, old):
        return jnp.where(newly, new, old)

    return PedState(
        pos_x=sel(schedule.pos_x, state.pos_x),
        pos_y=sel(schedule.pos_y, state.pos_y),
        vel_x=sel(schedule.vel_x, state.vel_x),
        vel_y=sel(schedule.vel_y, state.vel_y),
        radius=sel(schedule.radius, state.radius),
        base_speed=sel(schedule.speed, state.base_speed),
        crossing_speed=sel(schedule.crossing_speed, state.crossing_speed),
        safety_margin=sel(schedule.margin, state.safety_margin),
        fsm_target=sel(schedule.speed, state.fsm_target),
        applied_target=sel(schedule.speed, state.applied_target),
        mode=sel(schedule.initial_mode, state.mode),
        next_mode_time=sel(jnp.full_like(state.next_mode_time, -1.0),
                           state.next_mode_time),
        wp_x=sel(schedule.fwp_x, state.wp_x),
        wp_y=sel(schedule.fwp_y, state.wp_y),
        waypoint_idx=sel(jnp.zeros_like(state.waypoint_idx), state.waypoint_idx),
        alive=state.alive | newly,
        spawned=state.spawned | newly,
    )
