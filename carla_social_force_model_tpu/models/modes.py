"""Pedestrian mode finite-state machine as branchless masked integer updates.

The reference keeps one Python ``PedModeManager`` object per pedestrian
(/root/reference/ped_mode_manager.py); here the whole population's FSM state
lives in three arrays (``mode``, ``fsm_target``, ``next_mode_time``) and every
transition is a vectorized ``where``.  Transition semantics are replicated
exactly, including two quirks:

* ``ROAD_TO_SIDEWALK`` does *not* change the target speed (the crossing speed
  carries over until the next transition), ped_mode_manager.py:65-66.
* the per-tick *applied* target speed (used by forces and the speed cap) is
  the FSM target captured at the *start* of the tick, before IDLE promotion /
  gap-acceptance transitions run (pedestrian_simulation.py:63-73 mutate the
  FSM after ``apply_current_mode`` already copied target speeds at :63).
  The stepper handles that capture; this module only implements transitions.
"""
from __future__ import annotations

import jax.numpy as jnp

# PedMode enum values (reference ped_mode_manager.py:4-9)
IDLE = 0
WALKING_SIDEWALK = 1
CROSSING_ROAD = 2
ROAD_TO_SIDEWALK = 3
CHECKING_TRAFFIC = 4

#: seconds an IDLE pedestrian waits before auto-promoting to WALKING_SIDEWALK
#: (reference ped_mode_manager.py:28 ``waiting_time = 5``)
IDLE_WAITING_TIME = 5.0

MODE_NAMES = {
    IDLE: "IDLE",
    WALKING_SIDEWALK: "WALKING_SIDEWALK",
    CROSSING_ROAD: "CROSSING_ROAD",
    ROAD_TO_SIDEWALK: "ROAD_TO_SIDEWALK",
    CHECKING_TRAFFIC: "CHECKING_TRAFFIC",
}


def activate_mode(mode, fsm_target, next_mode_time, base_speed, crossing_speed,
                  new_mode, who, sim_time):
    """Vectorized ``PedModeManager._activate_mode`` (reference :49-70).

    ``who`` is a boolean mask of pedestrians whose mode becomes ``new_mode``
    (``new_mode`` may be an array or a scalar).  Returns updated
    ``(mode, fsm_target, next_mode_time)``.
    """
    new_mode = jnp.broadcast_to(jnp.asarray(new_mode, mode.dtype), mode.shape)
    # per-mode target speeds; ROAD_TO_SIDEWALK keeps the previous target
    target_by_mode = jnp.where(
        new_mode == WALKING_SIDEWALK, base_speed,
        jnp.where(new_mode == CROSSING_ROAD, crossing_speed,
                  jnp.where(new_mode == ROAD_TO_SIDEWALK, fsm_target, 0.0)))
    fsm_target = jnp.where(who, target_by_mode, fsm_target)
    next_mode_time = jnp.where(
        who & (new_mode == IDLE), sim_time + IDLE_WAITING_TIME, next_mode_time)
    mode = jnp.where(who, new_mode, mode)
    return mode, fsm_target, next_mode_time


def set_mode(mode, fsm_target, next_mode_time, base_speed, crossing_speed,
             new_mode, who, sim_time):
    """Vectorized ``PedModeManager.set_mode`` (reference :37-47).

    Inserts the intermediate modes: WALKING->CROSSING detours through
    CHECKING_TRAFFIC and CROSSING->WALKING through ROAD_TO_SIDEWALK.
    """
    new_mode = jnp.broadcast_to(jnp.asarray(new_mode, mode.dtype), mode.shape)
    to_checking = (mode == WALKING_SIDEWALK) & (new_mode == CROSSING_ROAD)
    to_road_to_sw = (mode == CROSSING_ROAD) & (new_mode == WALKING_SIDEWALK)
    actual = jnp.where(to_checking, CHECKING_TRAFFIC,
                       jnp.where(to_road_to_sw, ROAD_TO_SIDEWALK, new_mode))
    return activate_mode(mode, fsm_target, next_mode_time, base_speed,
                         crossing_speed, actual, who, sim_time)


def tick_idle(mode, fsm_target, next_mode_time, base_speed, crossing_speed,
              alive, sim_time):
    """Vectorized ``PedModeManager.tick`` (reference :30-35): IDLE pedestrians
    whose waiting time elapsed start walking."""
    promote = alive & (mode == IDLE) & (next_mode_time <= sim_time)
    return activate_mode(mode, fsm_target, next_mode_time, base_speed,
                         crossing_speed, WALKING_SIDEWALK, promote, sim_time)
