"""Fused Pallas TPU kernel for the N x N Moussaid pedestrian force.

The jnp formulation (ops/forces.pedestrian_force) is HBM-bound: XLA
materializes multiple (rows, N) pairwise intermediates per row block.  This
kernel tiles the interaction matrix over a (row_tile x col_tile) grid and
keeps every pairwise temporary in VMEM, so HBM traffic drops to the O(N)
state vectors and the O(N) force output while the VPU does the ~80 flops
per pair (2 exp, 1 atan2, 2 rsqrt dominate).

Semantics are identical to ops/forces._moussaid_pair_force (same masking,
same zero-guards); equivalence is enforced by tests against the jnp path
and the float64 oracle.

Layout: state ships as (1, N_pad) lane-major vectors (x, y, vx, vy, radius,
alive); each grid step loads a (1, TR) row slice and a (1, TC) column slice
and accumulates the row force tile over the column grid dimension
(sequential TPU grid -> revisiting-output accumulation).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.params import MoussaidParams


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


_PI = 3.14159265358979323846
_PI_2 = _PI / 2.0
_PI_4 = _PI / 4.0
_TAN_PI_8 = 0.41421356237309503


def _atan_unit(t):
    """atan(t) for t in [0, 1], Cephes atanf minimax polynomial (f32-exact to
    ~1 ulp) with the tan(pi/8) range reduction, branchless."""
    big = t > _TAN_PI_8
    t2 = jnp.where(big, (t - 1.0) / (t + 1.0), t)
    z = t2 * t2
    p = ((8.05374449538e-2 * z - 1.38776856032e-1) * z
         + 1.99777106478e-1) * z - 3.33329491539e-1
    r = t2 + t2 * z * p
    return jnp.where(big, r + _PI_4, r)


def _atan2(y, x):
    """Branchless atan2 built from :func:`_atan_unit` (Mosaic has no atan2
    lowering).  Matches numpy conventions incl. atan2(0, 0) = 0 and
    atan2(0, -x) = pi."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.where(hi == 0.0, 1.0, hi)
    r = _atan_unit(t)
    r = jnp.where(ay > ax, _PI_2 - r, r)
    r = jnp.where(x < 0.0, _PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def _pair_kernel(row_off_ref, prm_ref, rbb_ref, cbb_ref,
                 px_r, py_r, vx_r, vy_r, rad_r, alive_r,
                 px_c, py_c, vx_c, vy_c, rad_c, alive_c,
                 fx_ref, fy_ref, *, use_radius, tr, tc, cutoff):
    # row_off/prm/rbb/cbb are scalar-prefetch args (full arrays in SMEM);
    # force parameters ride in prm so they may be traced (vmap sweeps)
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        fx_ref[...] = jnp.zeros_like(fx_ref)
        fy_ref[...] = jnp.zeros_like(fy_ref)

    if cutoff is not None:
        # skip tile pairs whose bounding boxes are farther than the cutoff
        # (agents are Morton-sorted so boxes are tight; empty tiles carry
        # inverted infinite boxes and always skip)
        gx = jnp.maximum(jnp.maximum(cbb_ref[j, 0] - rbb_ref[i, 1],
                                     rbb_ref[i, 0] - cbb_ref[j, 1]), 0.0)
        gy = jnp.maximum(jnp.maximum(cbb_ref[j, 2] - rbb_ref[i, 3],
                                     rbb_ref[i, 2] - cbb_ref[j, 3]), 0.0)
        run_tile = gx * gx + gy * gy <= cutoff * cutoff
    else:
        run_tile = True

    # ids hoisted out of the predicated body (program_id is unavailable
    # inside a data-dependent pl.when under the interpreter)
    row0 = row_off_ref[0] + i * tr
    col0 = j * tc

    lam, A, gamma = prm_ref[0], prm_ref[1], prm_ref[2]
    n, n_prime, epsilon = prm_ref[3], prm_ref[4], prm_ref[5]

    @pl.when(run_tile)
    def _compute():
        _pair_tile(row0, col0, px_r, py_r, vx_r, vy_r, rad_r, alive_r,
                   px_c, py_c, vx_c, vy_c, rad_c, alive_c, fx_ref, fy_ref,
                   lam=lam, A=A, gamma=gamma, n=n, n_prime=n_prime,
                   epsilon=epsilon, use_radius=use_radius, tr=tr, tc=tc,
                   cutoff=cutoff)


def _pair_tile(row0, col0, px_r, py_r, vx_r, vy_r, rad_r, alive_r,
               px_c, py_c, vx_c, vy_c, rad_c, alive_c,
               fx_ref, fy_ref, *, lam, A, gamma, n, n_prime, epsilon,
               use_radius, tr, tc, cutoff):
    # row vectors as (TR, 1), column vectors as (1, TC)
    xi = px_r[...].reshape(tr, 1)
    yi = py_r[...].reshape(tr, 1)
    vxi = vx_r[...].reshape(tr, 1)
    vyi = vy_r[...].reshape(tr, 1)
    ai = alive_r[...].reshape(tr, 1)
    xj = px_c[...].reshape(1, tc)
    yj = py_c[...].reshape(1, tc)
    vxj = vx_c[...].reshape(1, tc)
    vyj = vy_c[...].reshape(1, tc)
    aj = alive_c[...].reshape(1, tc)

    dx = xj - xi                       # (TR, TC), x_j - x_i
    dy = yj - yi
    d2 = dx * dx + dy * dy
    r = jax.lax.rsqrt(jnp.where(d2 == 0.0, 1.0, d2))
    ex = dx * r
    ey = dy * r
    d = d2 * r
    if use_radius:
        d = d - (rad_r[...].reshape(tr, 1) + rad_c[...].reshape(1, tc))

    dvx = vxi - vxj                    # v_i - v_j
    dvy = vyi - vyj
    tx = lam * dvx + ex
    ty = lam * dvy + ey
    t2 = tx * tx + ty * ty
    rt = jax.lax.rsqrt(jnp.where(t2 == 0.0, 1.0, t2))
    thx = tx * rt
    thy = ty * rt
    t_len = t2 * rt

    cross = thx * ey - thy * ex
    dot = ex * thx + ey * thy
    theta = _atan2(cross, dot)

    B = gamma * t_len
    theta = theta + B * (-epsilon)

    # pair mask: both alive, not the self pair, interaction strength > 0
    # (row_off = global index of local row 0, nonzero under agent-sharding)
    ri = row0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
    cj = col0 + jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    ok = (ai > 0.0) & (aj > 0.0) & (ri != cj) & (B > 0.0)
    if cutoff is not None:
        # per-pair cutoff makes the result independent of tile layout:
        # force = sum over pairs within the cutoff radius, exactly
        ok = ok & (d2 <= cutoff * cutoff)

    B_safe = jnp.where(ok, B, 1.0)
    common = -d / B_safe
    Bt = B * theta
    f_v = -A * jnp.exp(common - jnp.square(n_prime * Bt))
    f_t = -A * jnp.sign(theta) * jnp.exp(common - jnp.square(n * Bt))
    f_v = jnp.where(ok, f_v, 0.0)
    f_t = jnp.where(ok, f_t, 0.0)

    # f = f_v * t_hat + f_t * left_normal(t_hat)
    fx = f_v * thx - f_t * thy
    fy = f_v * thy + f_t * thx
    fx_ref[...] += jnp.sum(fx, axis=1).reshape(1, tr)
    fy_ref[...] += jnp.sum(fy, axis=1).reshape(1, tr)


def pedestrian_force_pallas(pos, vel, radius, alive, p: MoussaidParams,
                            use_ped_radius: bool = False, row_tile: int = 512,
                            col_tile: int = 1024, interpret: bool = False,
                            axis_name: str | None = None,
                            cutoff: float | None = None):
    """Drop-in replacement for ops.forces.pedestrian_force.

    Force parameters ship to the kernel as scalar-prefetch values, so ``p``'s
    leaves may be traced -- parameter sweeps can vmap over them and keep the
    fused kernel (only ``cutoff`` and ``use_ped_radius`` are compile-time).

    With ``axis_name`` (under shard_map with rows sharded over that mesh
    axis), the column state is all-gathered over ICI and each device runs
    the kernel on its (local rows x global cols) slab; the self-pair mask
    uses the device's global row offset (shipped to SMEM).

    ``cutoff`` (meters): pairs farther apart contribute zero and tile pairs
    whose bounding boxes exceed the cutoff are skipped entirely.  Combine
    with Morton sorting (:func:`pedestrian_force_pallas_sorted`) for tight
    boxes.  A cutoff >= 110 * gamma * (2*lambda*v_max + 1) is f32-exact
    (the skipped exp underflows to +0); smaller values truncate the
    interaction range (error per skipped pair <= A*exp(-cutoff/B_max)).
    """
    n = pos.shape[0]

    if axis_name is not None:
        pos_c = jax.lax.all_gather(pos, axis_name, tiled=True)
        vel_c = jax.lax.all_gather(vel, axis_name, tiled=True)
        rad_c = jax.lax.all_gather(radius, axis_name, tiled=True)
        alive_c = jax.lax.all_gather(alive, axis_name, tiled=True)
        row_offset = jax.lax.axis_index(axis_name) * n
    else:
        pos_c, vel_c, rad_c, alive_c = pos, vel, radius, alive
        row_offset = 0
    n_c = pos_c.shape[0]

    n_rows = _round_up(max(n, row_tile), row_tile)
    n_cols = _round_up(max(n_c, col_tile), col_tile)

    def vec(a, width, count):
        out = jnp.zeros((1, width), jnp.float32)
        return out.at[0, :count].set(a.astype(jnp.float32))

    row_args = [vec(a, n_rows, n) for a in
                (pos[:, 0], pos[:, 1], vel[:, 0], vel[:, 1], radius,
                 alive.astype(jnp.float32))]
    col_args = [vec(a, n_cols, n_c) for a in
                (pos_c[:, 0], pos_c[:, 1], vel_c[:, 0], vel_c[:, 1], rad_c,
                 alive_c.astype(jnp.float32))]
    off = jnp.asarray(row_offset, jnp.int32).reshape(1)  # scalar prefetch

    tr, tc = row_tile, col_tile
    grid = (n_rows // tr, n_cols // tc)

    from .spatial import tile_bboxes
    row_bb = tile_bboxes(row_args[0][0], row_args[1][0],
                         row_args[5][0] > 0.0, tr)      # (grid0, 4)
    col_bb = tile_bboxes(col_args[0][0], col_args[1][0],
                         col_args[5][0] > 0.0, tc)      # (grid1, 4)

    # index maps receive (i, j, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec -- swallow the scalar refs
    row_spec = pl.BlockSpec((1, tr), lambda i, j, *_: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, tc), lambda i, j, *_: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, tr), lambda i, j, *_: (0, i),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _pair_kernel, use_radius=use_ped_radius, tr=tr, tc=tc,
        cutoff=float(cutoff) if cutoff is not None else None)
    prm = jnp.stack([jnp.asarray(v, jnp.float32) for v in
                     (p.lambda_, p.A, p.gamma, p.n, p.n_prime, p.epsilon)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[row_spec] * 6 + [col_spec] * 6,
        out_specs=(out_spec, out_spec),
    )
    fx, fy = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((1, n_rows), jnp.float32),
                   jax.ShapeDtypeStruct((1, n_rows), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=int(40 * n_rows * n_cols),
            bytes_accessed=int(4 * 8 * (n_rows * grid[1] + n_cols * grid[0])),
            transcendentals=int(5 * n_rows * n_cols)),
        interpret=interpret,
    )(off, prm, row_bb, col_bb, *row_args, *col_args)

    return jnp.stack([fx[0, :n], fy[0, :n]], axis=-1).astype(pos.dtype)


def pedestrian_force_pallas_sorted(pos, vel, radius, alive, p: MoussaidParams,
                                   cutoff: float,
                                   use_ped_radius: bool = False,
                                   row_tile: int = 512, col_tile: int = 1024,
                                   interpret: bool = False):
    """Morton-sorted cutoff kernel: sort agents along a Z-order curve so
    kernel tiles are spatially tight, run the cutoff kernel, scatter the
    forces back to the original slot order.  The result equals the unsorted
    cutoff kernel up to f32 summation order."""
    from .spatial import morton_order
    perm, inv = morton_order(pos, alive)
    force = pedestrian_force_pallas(
        pos[perm], vel[perm], radius[perm], alive[perm], p,
        use_ped_radius=use_ped_radius, row_tile=row_tile, col_tile=col_tile,
        interpret=interpret, cutoff=cutoff)
    return force[inv]
