"""Fixed-capacity SoA pedestrian state (the TPU-native PedState).

The reference keeps a dynamically grown structured numpy array with a Python
object column for the FSM (/root/reference/pedestrian_state.py:17-19) and
appends/deletes rows on spawn/despawn.  On TPU everything must be static
shape, so the population lives in ``(capacity,)`` arrays with ``alive`` /
``spawned`` masks: spawn = write-at-slot, despawn = clear mask.  All force and
FSM kernels respect the masks, which makes a masked fixed-capacity rollout
bit-equivalent to the reference's grow/shrink semantics.

Positions/velocities are 2-D; the reference's math is already 2-D (z is only
carried to/from CARLA, SURVEY.md section 7 layer 1).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass
from . import modes


@pytree_dataclass
class PedState:
    """Per-slot pedestrian state arrays (all shaped ``(capacity,)`` or
    ``(capacity, 2)``)."""

    pos: jnp.ndarray            # (N, 2) location [m]
    vel: jnp.ndarray            # (N, 2) velocity [m/s]
    radius: jnp.ndarray         # (N,)  pedestrian radius [m]
    base_speed: jnp.ndarray     # (N,)  configured walking target speed
    crossing_speed: jnp.ndarray  # (N,) crossing_speed_factor * base_speed
    safety_margin: jnp.ndarray  # (N,)  gap-acceptance safety margin [s]
    fsm_target: jnp.ndarray     # (N,)  FSM-internal target speed
    applied_target: jnp.ndarray  # (N,) target speed applied this tick (quirk)
    mode: jnp.ndarray           # (N,)  int32 PedMode
    next_mode_time: jnp.ndarray  # (N,) IDLE promotion deadline [s]
    waypoint: jnp.ndarray       # (N, 2) current next waypoint
    waypoint_idx: jnp.ndarray   # (N,)  int32 index into the route buffer
    alive: jnp.ndarray          # (N,)  bool: currently simulated
    spawned: jnp.ndarray        # (N,)  bool: slot has been activated

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    def max_speed(self, max_speed_factor):
        """Speed cap = applied target speed * factor (reference
        pedestrian_state.py:72-73 with the effective default factor)."""
        return self.applied_target * max_speed_factor

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "PedState":
        z = jnp.zeros((capacity,), dtype)
        z2 = jnp.zeros((capacity, 2), dtype)
        return PedState(
            pos=z2, vel=z2, radius=z, base_speed=z, crossing_speed=z,
            safety_margin=z, fsm_target=z, applied_target=z,
            mode=jnp.full((capacity,), modes.WALKING_SIDEWALK, jnp.int32),
            next_mode_time=jnp.full((capacity,), -1.0, dtype),
            waypoint=z2,
            waypoint_idx=jnp.zeros((capacity,), jnp.int32),
            alive=jnp.zeros((capacity,), bool),
            spawned=jnp.zeros((capacity,), bool),
        )
