"""Vectorized gap-acceptance road-crossing check.

Branchless jnp replacement for the reference's Shapely-based
``check_traffic`` (/root/reference/check_traffic.py:7-61): a pedestrian in
CHECKING_TRAFFIC may start crossing unless any moving vehicle's swept segment
(back -> front + v * (t_ped + margin)) intersects the pedestrian's crossing
segment with a time-to-intersection conflict.

The reference applies the *first* vehicle's (x, y) extent elementwise to all
vehicles' direction vectors (``vehicle_extents[:][0]``, check_traffic.py:35-36);
the physically-correct per-vehicle longitudinal extent is used by default and
the quirk is reproduced under ``strict_parity``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.geometry import segment_intersection
from ..ops import vecmath


def gap_ready(pos, goal, crossing_speed, margin,
              veh_center, veh_vel, veh_extent, veh_active,
              strict_parity: bool = False):
    """Per-pedestrian readiness to cross.

    Args:
      pos, goal: (N, 2) crossing segment endpoints (current loc -> waypoint).
      crossing_speed, margin: (N,).
      veh_center, veh_vel: (V, 2); veh_extent: (V, 2) bbox half extents;
      veh_active: (V,) bool.

    Returns (N,) bool; peds with negative margin always cross
    (check_traffic.py:23-24).
    """
    speed_safe = jnp.where(crossing_speed == 0.0, 1.0, crossing_speed)
    seg = goal - pos
    t_ped = vecmath.norm(seg) / speed_safe                       # (N,)

    veh_dir, veh_speed = vecmath.normalize(veh_vel)              # (V,2),(V,)
    if strict_parity:
        offset = veh_dir * veh_extent[0][None, :]                # quirk
    else:
        offset = veh_dir * veh_extent[:, 0:1]                    # longitudinal
    front = veh_center + offset                                  # (V, 2)
    back = veh_center - offset

    # vehicle goal depends on the pedestrian's crossing time -> (N, V, 2)
    horizon = (t_ped + margin)[:, None, None]
    veh_goal = front[None] + veh_vel[None] * horizon

    hit, ip = segment_intersection(
        pos[:, None, :], goal[:, None, :], back[None, :, :], veh_goal)

    tti_ped = vecmath.norm(ip - pos[:, None, :]) / speed_safe[:, None]
    vs_safe = jnp.where(veh_speed == 0.0, 1.0, veh_speed)[None, :]
    tti_front = vecmath.norm(ip - front[None]) / vs_safe
    tti_back = vecmath.norm(ip - back[None]) / vs_safe

    blocked = (hit & veh_active[None, :] & (veh_speed[None, :] != 0.0)
               & (tti_front - margin[:, None] < tti_ped)
               & (tti_ped < tti_back + margin[:, None]))
    return (margin < 0.0) | ~jnp.any(blocked, axis=1)
