"""Social-force kernels as pure, masked jnp functions.

Each kernel maps ``(state arrays, environment arrays, params) -> (N, 2)``
forces and is semantically equivalent to the corresponding reference force
(file:line cited per function) under the alive/pair masks that replace the
reference's dynamic row add/remove.  All kernels are shape-static, branchless
and jit/vmap/shard_map-safe; the fused Pallas variants live in
``ops/pallas_forces.py`` and are validated against these.

Where the reference divides by a vanishing interaction strength ``B``
(yielding inf/nan that numpy silently exp()s to 0 when the distance is
positive), we mask explicitly: pairs with ``B == 0`` contribute zero force,
which equals the reference result for all non-degenerate states (the only
divergence is two exactly-coincident pedestrians with equal velocities, where
the reference produces NaN).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import vecmath
from .geometry import closest_point_per_segment, segment_filter_mask
from ..env.pointsets import ChunkedPointSet
from ..models.params import AccelerationParams, BorderParams, MoussaidParams
from ..models import modes


def acceleration_force(pos, vel, waypoint, applied_target, p: AccelerationParams):
    """Relaxation toward target speed along the desired direction.

    Reference: forces.py:46-53 with desired_directions from
    stateutils.py:7-15 (zero-safe normalize of waypoint - pos).
    """
    e, _ = vecmath.normalize(waypoint - pos)
    return (applied_target[:, None] * e - vel) / p.tau


def _moussaid_pair_force(e, d, dv, p: MoussaidParams, pair_ok):
    """Shared Moussaid et al. (2009) interaction term.

    Args:
      e: unit vector from the pedestrian toward the interaction partner.
      d: distance to the partner (radii already subtracted if configured).
      dv: relative velocity (pedestrian minus partner).
      pair_ok: mask of pairs that contribute.

    Returns the (…, 2) force contribution per pair.
    Reference math: forces.py:85-115 (pedestrians) and :240-270 (obstacles).
    """
    t_vec = p.lambda_ * dv + e
    t_hat, t_len = vecmath.normalize(t_vec)
    n_hat = vecmath.left_normal(t_hat)
    theta = vecmath.angle_diff_2d(e, t_hat)
    B = p.gamma * t_len
    theta = theta + B * (-p.epsilon)
    ok = pair_ok & (B > 0.0)
    B_safe = jnp.where(ok, B, 1.0)
    common = -d / B_safe
    f_v = -p.A * jnp.exp(common - jnp.square(p.n_prime * B * theta))
    f_t = -p.A * jnp.sign(theta) * jnp.exp(common - jnp.square(p.n * B * theta))
    okf = jnp.expand_dims(ok, -1)
    return jnp.where(okf, f_v[..., None] * t_hat + f_t[..., None] * n_hat, 0.0)


def pedestrian_force(pos, vel, radius, alive, p: MoussaidParams,
                     use_ped_radius: bool = False, row_block: int = 1024,
                     axis_name: str | None = None):
    """Full N x N pedestrian interaction force (reference forces.py:74-117).

    Row-blocked with ``lax.map`` so the pairwise intermediates stay
    O(row_block * N) regardless of capacity.

    Agent-sharding: under ``shard_map`` with rows sharded over mesh axis
    ``axis_name``, pass that name -- the column ("other agents") state is
    all-gathered over ICI while each device computes only its row block of
    the N x N interaction (SURVEY.md section 2, parallelism inventory).
    """
    n_local = pos.shape[0]
    dtype = pos.dtype

    if axis_name is not None:
        pos_c = jax.lax.all_gather(pos, axis_name, tiled=True)
        vel_c = jax.lax.all_gather(vel, axis_name, tiled=True)
        rad_c = jax.lax.all_gather(radius, axis_name, tiled=True)
        alive_c = jax.lax.all_gather(alive, axis_name, tiled=True)
        row_offset = jax.lax.axis_index(axis_name) * n_local
    else:
        pos_c, vel_c, rad_c, alive_c = pos, vel, radius, alive
        row_offset = 0
    n_total = pos_c.shape[0]

    def block(row_idx):
        # row_idx: (R,) local row indices (may include padding >= n_local)
        in_range = row_idx < n_local
        safe_idx = jnp.minimum(row_idx, n_local - 1)
        pos_i = pos[safe_idx]
        vel_i = vel[safe_idx]
        rad_i = radius[safe_idx]
        alive_i = alive[safe_idx] & in_range

        dx = pos_c[None, :, :] - pos_i[:, None, :]        # x_j - x_i
        e, d = vecmath.normalize(dx)
        dv = vel_i[:, None, :] - vel_c[None, :, :]        # v_i - v_j
        if use_ped_radius:
            d = d - (rad_i[:, None] + rad_c[None, :])
        col = jnp.arange(n_total, dtype=row_idx.dtype)[None, :]
        not_self = (row_offset + safe_idx)[:, None] != col
        pair_ok = alive_i[:, None] & alive_c[None, :] & not_self
        f = _moussaid_pair_force(e, d, dv, p, pair_ok)    # (R, n_total, 2)
        return jnp.sum(f, axis=1)

    if n_local <= row_block:
        return block(jnp.arange(n_local, dtype=jnp.int32)).astype(dtype)

    n_pad = -(-n_local // row_block) * row_block
    rows = jnp.arange(n_pad, dtype=jnp.int32).reshape(-1, row_block)
    out = jax.lax.map(block, rows)                        # (n_pad/R, R, 2)
    return out.reshape(n_pad, 2)[:n_local].astype(dtype)


def border_force(pos, mode, radius, alive, borders: ChunkedPointSet,
                 p: BorderParams, use_ped_radius: bool = False):
    """Exponential repulsion from the nearest point of each relevant border.

    Reference: forces.py:138-179 -- per border within the section filter,
    take the single closest sampled point and add ``a*exp(-d/b)`` away from
    it; the force is disabled for pedestrians in CROSSING_ROAD /
    ROAD_TO_SIDEWALK modes (forces.py:176-177).
    """
    dist, point, has_point = closest_point_per_segment(pos, borders)  # (S,N)
    in_section = segment_filter_mask(pos, borders)
    e, d = vecmath.normalize(pos[None, :, :] - point)      # border -> ped
    if use_ped_radius:
        d = d - radius[None, :]
    ok = has_point & in_section & alive[None, :]
    f = e * (p.a * jnp.exp(-d / p.b))[..., None]
    force = jnp.sum(jnp.where(ok[..., None], f, 0.0), axis=0)  # (N, 2)
    crossing = (mode == modes.CROSSING_ROAD) | (mode == modes.ROAD_TO_SIDEWALK)
    return jnp.where(crossing[:, None], 0.0, force)


def obstacle_force(pos, vel, radius, alive, obstacles: ChunkedPointSet,
                   obstacle_vel, p: MoussaidParams,
                   use_ped_radius: bool = False, obstacle_active=None):
    """Moussaid interaction force against the closest point of each obstacle.

    Covers both the static (zero ``obstacle_vel``) and dynamic variants
    (reference forces.py:182-283; parameters differ per variant only).
    ``obstacle_active``: optional (S,) mask for obstacles that currently
    exist (despawned scripted vehicles).
    """
    dist, point, has_point = closest_point_per_segment(pos, obstacles)
    percept = segment_filter_mask(pos, obstacles)
    e, d = vecmath.normalize(point - pos[None, :, :])      # ped -> obstacle
    if use_ped_radius:
        d = d - radius[None, :]
    dv = vel[None, :, :] - obstacle_vel[:, None, :]        # (S, N, 2)
    ok = has_point & percept & alive[None, :]
    if obstacle_active is not None:
        ok = ok & obstacle_active[:, None]
    f = _moussaid_pair_force(e, d, dv, p, ok)              # (S, N, 2)
    return jnp.sum(f, axis=0)
