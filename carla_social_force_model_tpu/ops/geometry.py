"""Geometry kernels: segmented closest points and 2-D segment intersection.

``closest_point_per_segment`` is the TPU-native replacement for the
reference's per-pedestrian Python loops that take *one* closest point per
border/obstacle and then sum force contributions over borders/obstacles
(/root/reference/forces.py:154-155, :228-229).  It is exact (direct
coordinate differences, no |x|^2-2xy expansion) and memory-bounded via a
``lax.map`` over chunk groups.

``segment_intersection`` is the branchless jnp replacement for the Shapely
calls in the reference's gap-acceptance check (check_traffic.py:30-48).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..env.pointsets import PAD_COORD, ChunkedPointSet

_INF = jnp.inf
# numpy (not jnp) scalar: a module-level jnp constant would initialize the
# device backend at import time, before a CLI --platform override can apply
_BIG_I32 = np.int32(2**31 - 1)
_PAD = float(PAD_COORD)
#: squared-distance threshold separating real hits from padding sentinels
_PAD_DIST2 = 1e13


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def closest_point_per_segment(pos, pset: ChunkedPointSet,
                              max_group_elems: int = 4_000_000,
                              use_pallas: bool | None = None,
                              interpret: bool = False):
    """Per (segment, pedestrian) closest outline point.

    Args:
      pos: ``(N, 2)`` pedestrian positions.
      pset: chunked point set with ``S`` segments.
      max_group_elems: cap on ``chunk_group_points * N`` to bound the
        intermediate ``(G, K, N)`` distance tensor (jnp path).
      use_pallas: fused TPU kernel for the per-chunk distance scan (the hot
        O(P*N) part); None = auto on TPU backends when chunk_size == 128.
      interpret: run the Pallas kernel interpreted (CPU tests).

    Returns:
      ``(dist, point, has_point)`` with shapes ``(S, N)``, ``(S, N, 2)``,
      ``(S, N)``; ``has_point`` is False where a segment has no valid points.
      Tie-breaking is the reference's first-occurrence ``argmin``.
    """
    n = pos.shape[0]
    c, k, _ = pset.points.shape
    s = pset.num_segments

    if use_pallas is None:
        import jax as _jax
        use_pallas = (_jax.default_backend() == "tpu" and k == 128)
    if use_pallas and k == 128:
        return _closest_point_pallas(pos, pset, interpret=interpret)

    # chunks per lax.map group, bounded by the (G, K, N) intermediate
    g = max(1, min(c, max_group_elems // max(1, k * n)))
    c_pad = _round_up(c, g)

    pts = jnp.concatenate(
        [pset.points, jnp.zeros((c_pad - c, k, 2), pset.points.dtype)], axis=0)
    val = jnp.concatenate(
        [pset.valid, jnp.zeros((c_pad - c, k), bool)], axis=0)
    pts_g = pts.reshape(c_pad // g, g, k, 2)
    val_g = val.reshape(c_pad // g, g, k)

    px, py = pos[:, 0], pos[:, 1]

    def per_group(args):
        p_g, v_g = args  # (G, K, 2), (G, K)
        # separate coordinate planes keep N in the minor (lane) dimension --
        # a (..., 2)-minor layout pads 2 -> 128 lanes and is ~10x slower
        dx = p_g[:, :, 0, None] - px[None, None, :]               # (G, K, N)
        dy = p_g[:, :, 1, None] - py[None, None, :]
        d2 = dx * dx + dy * dy
        d2 = jnp.where(v_g[:, :, None], d2, _INF)
        idx = jnp.argmin(d2, axis=1)                              # (G, N) first-occurrence
        dmin2 = jnp.take_along_axis(d2, idx[:, None, :], axis=1)[:, 0, :]
        best = jnp.take_along_axis(p_g, idx[:, :, None], axis=1)  # (G, N, 2)
        return dmin2, best

    if c_pad // g > 1:
        dmin2, best = jax.lax.map(per_group, (pts_g, val_g))
        dmin2 = dmin2.reshape(c_pad, n)[:c]
        best = best.reshape(c_pad, n, 2)[:c]
    else:
        dmin2, best = per_group((pts_g[0], val_g[0]))
        dmin2, best = dmin2[:c], best[:c]

    # segmented min over chunks -> per-segment min (dummy segment S absorbs nothing
    # here since every chunk has a real segment id; +1 guards empty sets)
    seg = pset.chunk_segment
    dseg2 = jax.ops.segment_min(dmin2, seg, num_segments=s)        # (S, N)

    # first chunk attaining the per-segment min (reference argmin tie rule)
    chunk_idx = jnp.arange(c, dtype=jnp.int32)[:, None]
    cand = jnp.where(dmin2 == dseg2[seg], chunk_idx, _BIG_I32)
    first_chunk = jax.ops.segment_min(cand, seg, num_segments=s)   # (S, N)
    has_point = jnp.isfinite(dseg2) & (first_chunk < _BIG_I32)
    first_chunk = jnp.clip(first_chunk, 0, max(c - 1, 0))
    point = jnp.take_along_axis(best, first_chunk[:, :, None], axis=0)  # (S, N, 2)

    dist = jnp.sqrt(jnp.where(has_point, dseg2, 0.0))
    return dist, point, has_point


def _cp_kernel(bx, by, px, py, dmin_ref, idx_ref, *, tp, tc):
    """Per-(point-tile, ped-tile) chunk minima.  Points ride the sublane
    axis (tp = g*128 per tile, one 128-point chunk per sublane group) and
    pedestrians the lane axis, so the within-chunk min/argmin are natural
    sublane reductions and the (g, TC) output block is layout-aligned."""
    i = pl.program_id(0)
    g = tp // 128

    dx = bx[...] - px[...]            # (TP, TC)
    dy = by[...] - py[...]
    d2 = (dx * dx + dy * dy).reshape(g, 128, tc)

    dmin = jnp.min(d2, axis=1)        # (g, TC)
    dmin_ref[...] = dmin
    sub = jax.lax.broadcasted_iota(jnp.int32, (g, 128, tc), 1)
    # first-occurrence argmin, explicitly (reference np.argmin tie rule);
    # the sentinel is a Python literal (jnp constants can't be captured)
    first = jnp.min(jnp.where(d2 == dmin[:, None, :], sub, 2**31 - 1),
                    axis=1)           # (g, TC)
    base = (i * tp
            + jax.lax.broadcasted_iota(jnp.int32, (g, tc), 0) * 128)
    idx_ref[...] = base + first       # global flat point index


def _closest_point_pallas(pos, pset: ChunkedPointSet, point_tile: int = 1024,
                          ped_tile: int = 512, interpret: bool = False):
    """Fused TPU path: one kernel computes the (C, N) per-chunk minima and
    argmin indices (the O(P*N) hot part, replacing the (G, K, N) jnp
    intermediates and their gathers); the cheap (C, N) -> (S, N) segmented
    reduction stays in jnp."""
    n = pos.shape[0]
    c, k, _ = pset.points.shape
    s = pset.num_segments
    assert k == 128

    # flat staged point planes; invalid slots go far away (live templates of
    # inactive vehicles carry real coordinates with valid=False)
    fx = jnp.where(pset.valid, pset.points[..., 0], _PAD).reshape(-1)
    fy = jnp.where(pset.valid, pset.points[..., 1], _PAD).reshape(-1)
    p_total = c * k
    tp, tc = point_tile, ped_tile
    p_pad = _round_up(p_total, tp)
    fx = jnp.full((p_pad,), _PAD, jnp.float32).at[:p_total].set(
        fx.astype(jnp.float32)).reshape(p_pad, 1)
    fy = jnp.full((p_pad,), _PAD, jnp.float32).at[:p_total].set(
        fy.astype(jnp.float32)).reshape(p_pad, 1)
    c_pad = p_pad // k

    n_pad = _round_up(max(n, tc), tc)
    px = jnp.full((n_pad,), _PAD, jnp.float32).at[:n].set(
        pos[:, 0].astype(jnp.float32)).reshape(1, n_pad)
    py = jnp.full((n_pad,), _PAD, jnp.float32).at[:n].set(
        pos[:, 1].astype(jnp.float32)).reshape(1, n_pad)

    g = tp // k
    grid = (p_pad // tp, n_pad // tc)
    pt_spec = pl.BlockSpec((tp, 1), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    ped_spec = pl.BlockSpec((1, tc), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, tc), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)

    import functools as _functools
    dmin, idx = pl.pallas_call(
        _functools.partial(_cp_kernel, tp=tp, tc=tc),
        grid=grid,
        in_specs=[pt_spec, pt_spec, ped_spec, ped_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((c_pad, n_pad), jnp.int32)),
        cost_estimate=pl.CostEstimate(
            flops=int(8 * n_pad * p_pad),
            bytes_accessed=int(4 * (n_pad * grid[0] + p_pad * grid[1]
                                    + 2 * n_pad * c_pad)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(fx, fy, px, py)

    dmin = dmin[:c, :n]               # (C, N)
    idx = idx[:c, :n]                 # (C, N) global flat point indices

    seg = pset.chunk_segment
    dseg2 = jax.ops.segment_min(dmin, seg, num_segments=s)        # (S, N)
    chunk_idx = jnp.arange(c, dtype=jnp.int32)[:, None]
    cand = jnp.where(dmin == dseg2[seg], chunk_idx, _BIG_I32)
    first_chunk = jax.ops.segment_min(cand, seg, num_segments=s)  # (S, N)
    has_point = (dseg2 < _PAD_DIST2) & (first_chunk < _BIG_I32)
    first_chunk = jnp.clip(first_chunk, 0, max(c - 1, 0))
    flat_idx = jnp.take_along_axis(idx, first_chunk, axis=0)      # (S, N)
    point = pset.points.reshape(p_total, 2)[flat_idx]             # (S, N, 2)
    dist = jnp.sqrt(jnp.where(has_point, dseg2, 0.0))
    return dist, point, has_point


def _cpc_kernel(circ_ref, bb_ref, bx, by, px, py, d2_ref, wx_ref, wy_ref,
                *, tp, tc):
    """Per-(point-tile, ped-tile) chunk minima WITH coordinates, under a
    chunk-circle x ped-tile-bbox skip (the ops/pallas_env filter-circle
    idiom).  Unlike :func:`_cp_kernel` the closest point's coordinates are
    selected in-kernel by a first-occurrence one-hot sublane reduction, so
    no (rows x N) point gather ever materializes downstream."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    g = tp // 128

    minx = bb_ref[0, j]
    maxx = bb_ref[1, j]
    miny = bb_ref[2, j]
    maxy = bb_ref[3, j]
    hits = []
    for gi in range(g):
        c = i * g + gi
        gx = jnp.maximum(jnp.maximum(circ_ref[0, c] - maxx,
                                     minx - circ_ref[0, c]), 0.0)
        gy = jnp.maximum(jnp.maximum(circ_ref[1, c] - maxy,
                                     miny - circ_ref[1, c]), 0.0)
        hits.append(gx * gx + gy * gy <= circ_ref[2, c])
    hit = hits[0]
    for h in hits[1:]:
        hit = jnp.logical_or(hit, h)

    @pl.when(hit)
    def _():
        # per-CHUNK compute skip: a point tile bundles g chunks, usually
        # along one wall stretch -- with Hilbert-sorted ped tiles most of
        # the bundle misses the tile bbox even when one chunk hits, so each
        # 128-point chunk's (128, TC) distance block is guarded by its own
        # circle test (measured 29.4 -> per-hit-chunk cost at N=50k,
        # tools/profile_orca_statics.py)
        for gi in range(g):
            sl = slice(gi * 128, (gi + 1) * 128)

            @pl.when(hits[gi])
            def _(sl=sl, gi=gi):
                dx = bx[sl, :] - px[...]              # (128, TC)
                dy = by[sl, :] - py[...]
                d2 = dx * dx + dy * dy
                dmin = jnp.min(d2, axis=0, keepdims=True)     # (1, TC)
                eq = d2 == dmin
                # first-occurrence tie-break (argmin semantics) via
                # iota-min -- Mosaic has no cumsum lowering
                ids = jax.lax.broadcasted_iota(jnp.int32, (128, tc), 0)
                idx = jnp.min(jnp.where(eq, ids, 128), axis=0,
                              keepdims=True)
                first = (ids == idx).astype(jnp.float32)
                d2_ref[gi:gi + 1, :] = dmin
                wx_ref[gi:gi + 1, :] = jnp.sum(first * bx[sl, :], axis=0,
                                               keepdims=True)
                wy_ref[gi:gi + 1, :] = jnp.sum(first * by[sl, :], axis=0,
                                               keepdims=True)

            @pl.when(jnp.logical_not(hits[gi]))
            def _(gi=gi):
                d2_ref[gi:gi + 1, :] = jnp.full((1, tc), _PAD_DIST2,
                                                jnp.float32)
                wx_ref[gi:gi + 1, :] = jnp.zeros((1, tc), jnp.float32)
                wy_ref[gi:gi + 1, :] = jnp.zeros((1, tc), jnp.float32)

    @pl.when(jnp.logical_not(hit))
    def _():
        d2_ref[...] = jnp.full_like(d2_ref, _PAD_DIST2)
        wx_ref[...] = jnp.zeros_like(wx_ref)
        wy_ref[...] = jnp.zeros_like(wy_ref)


def closest_point_per_chunk(pos_x, pos_y, pset: ChunkedPointSet,
                            neigh_dist: float, alive=None,
                            use_pallas: bool | None = None,
                            interpret: bool = False,
                            point_tile: int = 1024, ped_tile: int = 512):
    """Per (chunk, pedestrian) squared distance + closest-point planes.

    The ORCA static-constraint feed (ops/orca._static_constraints).  Unlike
    :func:`closest_point_per_segment` -- which serves the reference's
    per-*segment* argmin semantics (forces.py:154-155) -- the velocity
    projection only needs *k nearest distinct wall features*, and one
    128-point chunk (a 12.8 m wall stretch at the reference's 0.1 m
    sampling) is a finer feature than a <=30 m segment.  Staying at chunk
    granularity with planar outputs removes the two costs that made the
    segment path unfit for the ORCA hot loop: the (S, N)-row gather of
    closest-point coordinates (~10 ns/row, CLAUDE.md) and the (S, N, 2)
    size-2-minor tensor.  The Pallas path also skips (point-tile,
    ped-tile) pairs whose chunk circles (inflated by ``neigh_dist``) miss
    the ped tile's bounding box -- with Hilbert-sorted pedestrians (the
    ORCA pipeline's order) most wall stretches are skipped.

    ``alive``: optional (N,) mask tightening the ped-tile bboxes (dead
    rows ride at sentinel coordinates).

    Returns ``(d2, wx, wy)``: (C, N) f32 planes; ``d2 = inf`` where the
    chunk has no valid point within ``neigh_dist`` of the pedestrian
    (skipped tiles included), so both backends agree after masking.
    """
    n = pos_x.shape[0]
    c, k, _ = pset.points.shape
    nd2 = jnp.float32(neigh_dist) ** 2

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu" and k == 128)

    if use_pallas and k == 128:
        d2, wx, wy = _closest_chunk_pallas(pos_x, pos_y, pset, neigh_dist,
                                           alive=alive, interpret=interpret,
                                           point_tile=point_tile,
                                           ped_tile=ped_tile)
    else:
        # grouped jnp fallback (CPU tests / odd chunk sizes): per-chunk
        # min + first-occurrence selection, no tile skip
        px, py = pos_x, pos_y
        vx = jnp.where(pset.valid, pset.points[..., 0], _PAD)
        vy = jnp.where(pset.valid, pset.points[..., 1], _PAD)
        g = max(1, min(c, 4_000_000 // max(1, k * n)))
        c_pad = _round_up(c, g)
        vx = jnp.concatenate([vx, jnp.full((c_pad - c, k), _PAD, vx.dtype)])
        vy = jnp.concatenate([vy, jnp.full((c_pad - c, k), _PAD, vy.dtype)])

        def per_group(args):
            gx, gy = args                                     # (G, K)
            dx = gx[:, :, None] - px[None, None, :]           # (G, K, N)
            dy = gy[:, :, None] - py[None, None, :]
            d2g = dx * dx + dy * dy
            idx = jnp.argmin(d2g, axis=1)                     # (G, N)
            dmin = jnp.take_along_axis(d2g, idx[:, None, :], axis=1)[:, 0]
            bx = jnp.take_along_axis(gx[:, :, None],
                                     idx[:, None, :], axis=1)[:, 0]
            by = jnp.take_along_axis(gy[:, :, None],
                                     idx[:, None, :], axis=1)[:, 0]
            return dmin, bx, by

        vx_g = vx.reshape(c_pad // g, g, k)
        vy_g = vy.reshape(c_pad // g, g, k)
        if c_pad // g > 1:
            dmin, bx, by = jax.lax.map(per_group, (vx_g, vy_g))
            d2 = dmin.reshape(c_pad, n)[:c]
            wx = bx.reshape(c_pad, n)[:c]
            wy = by.reshape(c_pad, n)[:c]
        else:
            d2, wx, wy = per_group((vx_g[0], vy_g[0]))
            d2, wx, wy = d2[:c], wx[:c], wy[:c]

    d2 = jnp.where(d2 <= nd2, d2, _INF)
    return d2, wx, wy


def _closest_chunk_pallas(pos_x, pos_y, pset: ChunkedPointSet,
                          neigh_dist: float, alive=None,
                          interpret: bool = False,
                          point_tile: int = 1024, ped_tile: int = 512):
    from .spatial import tile_bboxes
    n = pos_x.shape[0]
    c, k, _ = pset.points.shape
    assert k == 128
    tp, tc = point_tile, ped_tile
    g = tp // k
    # Mosaic requires the (g, tc) output block's sublane dim divisible by
    # 8 -- so the point tile must cover 8 chunks of 128 at a time
    if g % 8 != 0:
        raise ValueError(
            f"point_tile must be a multiple of 1024 (8 chunks of 128 "
            f"points), got {point_tile}")

    fx = jnp.where(pset.valid, pset.points[..., 0], _PAD)
    fy = jnp.where(pset.valid, pset.points[..., 1], _PAD)

    # chunk filter circles (center + bounding radius inflated by
    # neigh_dist, squared); empty chunks get r2 = -1 (never hit)
    vxm = jnp.where(pset.valid, fx, _INF).min(axis=1)
    vxM = jnp.where(pset.valid, fx, -_INF).max(axis=1)
    vym = jnp.where(pset.valid, fy, _INF).min(axis=1)
    vyM = jnp.where(pset.valid, fy, -_INF).max(axis=1)
    nonempty = pset.valid.any(axis=1)
    ccx = jnp.where(nonempty, 0.5 * (vxm + vxM), 0.0)
    ccy = jnp.where(nonempty, 0.5 * (vym + vyM), 0.0)
    rad = jnp.sqrt(jnp.where(nonempty,
                             jnp.square(0.5 * (vxM - vxm))
                             + jnp.square(0.5 * (vyM - vym)), 0.0))
    r2 = jnp.where(nonempty, jnp.square(rad + neigh_dist), -1.0)

    p_total = c * k
    p_pad = _round_up(p_total, tp)
    c_pad = p_pad // k
    fxp = jnp.full((p_pad,), _PAD, jnp.float32).at[:p_total].set(
        fx.astype(jnp.float32).reshape(-1)).reshape(p_pad, 1)
    fyp = jnp.full((p_pad,), _PAD, jnp.float32).at[:p_total].set(
        fy.astype(jnp.float32).reshape(-1)).reshape(p_pad, 1)
    circ = jnp.stack([
        jnp.zeros((c_pad,), jnp.float32).at[:c].set(ccx.astype(jnp.float32)),
        jnp.zeros((c_pad,), jnp.float32).at[:c].set(ccy.astype(jnp.float32)),
        jnp.full((c_pad,), -1.0, jnp.float32).at[:c].set(
            r2.astype(jnp.float32)),
    ])                                                       # (3, c_pad)

    n_pad = _round_up(max(n, tc), tc)
    live = (jnp.ones((n,), bool) if alive is None else alive)
    px = jnp.full((n_pad,), _PAD, jnp.float32).at[:n].set(
        pos_x.astype(jnp.float32))
    py = jnp.full((n_pad,), _PAD, jnp.float32).at[:n].set(
        pos_y.astype(jnp.float32))
    live_pad = jnp.zeros((n_pad,), bool).at[:n].set(live)
    bb = tile_bboxes(px, py, live_pad, tc).T                  # (4, n_tiles)

    grid = (p_pad // tp, n_pad // tc)
    pt_spec = pl.BlockSpec((tp, 1), lambda i, j, *_: (i, 0),
                           memory_space=pltpu.VMEM)
    ped_spec = pl.BlockSpec((1, tc), lambda i, j, *_: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, tc), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)

    import functools as _functools
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[pt_spec, pt_spec, ped_spec, ped_spec],
        out_specs=(out_spec, out_spec, out_spec),
    )
    d2, wx, wy = pl.pallas_call(
        _functools.partial(_cpc_kernel, tp=tp, tc=tc),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32)),
        cost_estimate=pl.CostEstimate(
            flops=int(8 * n_pad * p_pad),
            bytes_accessed=int(4 * (2 * n_pad * grid[0] + 2 * p_pad
                                    * grid[1] + 3 * n_pad * c_pad)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(circ, bb, fxp, fyp, px.reshape(1, n_pad), py.reshape(1, n_pad))
    return d2[:c, :n], wx[:c, :n], wy[:c, :n]


def feature_closest_planes(pos_x, pos_y, feat, neigh_dist: float,
                           max_group_elems: int = 4_000_000):
    """Per (segment-feature, pedestrian) squared distance + exact closest
    point ON the segment (the analytic ORCA static feed;
    env/pointsets.SegmentFeatures).

    Planar throughout: ``(F, N)`` outputs with N minor (the TPU layout
    rule), grouped over feature blocks by ``lax.map`` to bound the
    intermediates.  ``d2 = inf`` where the feature is farther than
    ``neigh_dist``.  The jnp twin of the fused Pallas top-k kernel
    (ops/pallas_statics.py), which never materializes the (F, N) planes.
    """
    f = feat.ax.shape[0]
    n = pos_x.shape[0]
    nd2 = jnp.float32(neigh_dist) ** 2
    g = max(1, min(f, max_group_elems // max(1, n)))
    f_pad = _round_up(f, g)

    def pad(a, fill):
        return jnp.concatenate(
            [a.astype(jnp.float32),
             jnp.full((f_pad - f,), jnp.float32(fill))])

    ax, ay = pad(feat.ax, _PAD), pad(feat.ay, _PAD)
    ux, uy, il2 = pad(feat.ux, 0.0), pad(feat.uy, 0.0), pad(feat.il2, 0.0)

    def per_group(planes):
        gax, gay, gux, guy, gil2 = planes                 # (G,)
        dxa = pos_x[None, :] - gax[:, None]               # (G, N)
        dya = pos_y[None, :] - gay[:, None]
        t = jnp.clip((dxa * gux[:, None] + dya * guy[:, None])
                     * gil2[:, None], 0.0, 1.0)
        cx = gax[:, None] + t * gux[:, None]
        cy = gay[:, None] + t * guy[:, None]
        ddx = pos_x[None, :] - cx
        ddy = pos_y[None, :] - cy
        return ddx * ddx + ddy * ddy, cx, cy

    grouped = tuple(v.reshape(f_pad // g, g) for v in (ax, ay, ux, uy, il2))
    if f_pad // g > 1:
        d2, wx, wy = jax.lax.map(per_group, grouped)
        d2 = d2.reshape(f_pad, n)[:f]
        wx = wx.reshape(f_pad, n)[:f]
        wy = wy.reshape(f_pad, n)[:f]
    else:
        d2, wx, wy = per_group(tuple(v[0] for v in grouped))
        d2, wx, wy = d2[:f], wx[:f], wy[:f]
    return jnp.where(d2 <= nd2, d2, _INF), wx, wy


def k_smallest_features(d2, planes, k: int):
    """K masked min-extraction passes over the LEADING feature axis.

    The feature-major twin of ops/orca._k_nearest: inputs ``(F, N)`` with
    pedestrians minor, so no (N, F) transpose of the big planes ever
    materializes and every reduction runs over sublanes (the chunk-feed
    version of this transposed first -- at 2,070 chunks x 50k agents that
    was most of the statics cost, BENCH.md round-5 table).  ``d2`` uses
    ``inf`` for invalid; payload ``planes`` must be finite.  Returns
    ``(sel_planes, valid)`` with shapes ``(k, N)``, selection ascending
    with first-occurrence (lowest feature index) tie-breaking.
    """
    outs = [[] for _ in planes]
    valids = []
    for _ in range(k):
        mn = jnp.min(d2, axis=0)                        # (N,)
        hit = (d2 == mn[None, :]) & jnp.isfinite(mn)[None, :]
        first = hit & (jnp.cumsum(hit, axis=0) == 1)
        fsel = first.astype(planes[0].dtype)
        for out, pl_ in zip(outs, planes):
            out.append(jnp.sum(pl_ * fsel, axis=0))
        valids.append(jnp.any(first, axis=0))
        d2 = jnp.where(first, _INF, d2)
    sel = tuple(jnp.stack(o, axis=0) for o in outs)
    return sel, jnp.stack(valids, axis=0)


def segment_filter_mask(pos, pset: ChunkedPointSet):
    """Coarse per-(segment, ped) relevance filter: ``|pos - center| < radius``.

    Matches the reference's border section filter (forces.py:149-151) and the
    obstacle perception filter (forces.py:222-224), both strict ``<``.
    (Planar coordinate math with N in the minor dimension and a squared
    comparison -- sqrt(x) < r <=> x < r*r for r >= 0.)
    """
    dx = pset.centers[:, 0, None] - pos[None, :, 0]            # (S, N)
    dy = pset.centers[:, 1, None] - pos[None, :, 1]
    d2 = dx * dx + dy * dy
    r = jnp.maximum(pset.filter_radius, 0.0)
    return d2 < (r * r)[:, None]


def segment_intersection_xy(p0x, p0y, p1x, p1y, q0x, q0y, q1x, q1y,
                            eps: float = 0.0):
    """Planar :func:`segment_intersection` (same math on x/y planes --
    the hot-path form: no size-2-minor intermediates).

    Returns ``(hit, ipx, ipy)`` with intersection coordinates zeroed when
    there is no hit."""
    rx, ry = p1x - p0x, p1y - p0y
    sx, sy = q1x - q0x, q1y - q0y
    denom = rx * sy - ry * sx
    qpx, qpy = q0x - p0x, q0y - p0y
    t_num = qpx * sy - qpy * sx
    u_num = qpx * ry - qpy * rx
    safe = jnp.where(denom == 0.0, 1.0, denom)
    t = t_num / safe
    u = u_num / safe
    hit = ((denom != 0.0) & (t >= -eps) & (t <= 1.0 + eps)
           & (u >= -eps) & (u <= 1.0 + eps))
    zero = jnp.zeros((), t.dtype)
    ipx = jnp.where(hit, p0x + t * rx, zero)
    ipy = jnp.where(hit, p0y + t * ry, zero)
    return hit, ipx, ipy


def segment_intersection(p0, p1, q0, q1, eps: float = 0.0):
    """Intersection of 2-D segments ``[p0, p1]`` and ``[q0, q1]`` (batched).

    Returns ``(hit, point)``: ``hit`` is True for a proper (non-parallel)
    intersection with both parameters in ``[0, 1]``; ``point`` is the
    intersection location (zeros when no hit).  Collinear-overlap cases are
    reported as no hit (the reference delegates these to Shapely where they
    are measure-zero; documented deviation).
    """
    r = p1 - p0
    s = q1 - q0
    denom = r[..., 0] * s[..., 1] - r[..., 1] * s[..., 0]
    qp = q0 - p0
    t_num = qp[..., 0] * s[..., 1] - qp[..., 1] * s[..., 0]
    u_num = qp[..., 0] * r[..., 1] - qp[..., 1] * r[..., 0]
    safe = jnp.where(denom == 0.0, 1.0, denom)
    t = t_num / safe
    u = u_num / safe
    hit = (denom != 0.0) & (t >= -eps) & (t <= 1.0 + eps) & (u >= -eps) & (u <= 1.0 + eps)
    point = p0 + jnp.expand_dims(t, -1) * r
    return hit, jnp.where(jnp.expand_dims(hit, -1), point, 0.0)
