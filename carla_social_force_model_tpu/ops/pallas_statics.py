"""Fused Pallas TPU top-k nearest-wall-feature kernels (ORCA statics feed).

The ORCA velocity projection constrains each agent against its ``k``
nearest static wall features (ops/orca._static_constraints -- the hard
half-plane counterpart of the reference's soft border force,
/root/reference/forces.py:138-179).  The two-phase formulation (a
closest-point pass producing ``(F, N)`` distance/coordinate planes, then
k min-extraction sweeps) is HBM-bound: at N=50k over the street grid's
2,070 wall chunks the (C, N) planes are ~1.2 GB per step and the
extraction re-reads them k times -- ~39 ms/step, the single measured
production configuration below the 1M agent-steps/s target (BENCH.md
round-4 ORCA table).

These kernels instead keep a RUNNING TOP-K in the revisited output block
(one (8, ped_tile) VMEM tile per ped tile, resident across the feature
grid axis) and merge each feature tile's candidates into it in-kernel, so
nothing (F, N)-shaped ever exists -- output traffic is O(k * N) however
many features there are.  Two feature kinds share the merge machinery:

* **analytic segment features** (env/pointsets.SegmentFeatures): the
  Douglas-Peucker line segments of simplifiable wall sections; the
  closest point is computed exactly ON the segment (a projection --
  ~100x less arithmetic than scanning a 128-point chunk, and more
  faithful than the reference's 0.1 m sampling);
* **sampled chunk features** (env/pointsets.ChunkedPointSet): one
  closest point per 128-point chunk for geometry that does not simplify
  (tightly curved obstacle outlines), matching ops/geometry.
  closest_point_per_chunk's feature semantics.

A (feature-tile circle) x (ped-tile bbox) test skips non-interacting grid
steps (the ops/pallas_env filter idiom); the in-kernel ``d2 <= nd2`` mask
keeps the skip exact.  ``nd2`` rides as a scalar-prefetch value because
``neighbor_dist`` is a sweepable pytree leaf (models/params.py), not a
trace-time constant.

Equivalence to the jnp path (ops/geometry.feature_closest_planes /
closest_point_per_chunk + k_smallest_features) is enforced by
tests/test_orca_statics.py in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .geometry import (_PAD, _PAD_DIST2, _round_up, closest_point_per_chunk,
                       feature_closest_planes, k_smallest_features)
from .spatial import tile_bboxes

#: running-list rows in the output block (TPU sublane tiling: multiple of 8)
_KP = 8


def _merge_topk(d2_tile, cx_tile, cy_tile, d2_ref, wx_ref, wy_ref,
                *, k: int, rows: int):
    """Insert the ``min(k, rows)`` smallest of the (rows, tc) tile
    candidates into the running ascending top-k in the output refs.

    Candidate extraction is first-occurrence (lowest row index) per pass;
    insertion uses strict ``<`` compare-swaps, so earlier-inserted (lower
    feature index) candidates win ties -- the same selection set and
    tie-break as the jnp ``k_smallest_features``.  Invalid candidates ride
    at the ``_PAD_DIST2`` sentinel and never displace anything.
    """
    run_d = [d2_ref[s:s + 1, :] for s in range(k)]
    run_x = [wx_ref[s:s + 1, :] for s in range(k)]
    run_y = [wy_ref[s:s + 1, :] for s in range(k)]
    for _ in range(min(k, rows)):
        mn = jnp.min(d2_tile, axis=0, keepdims=True)          # (1, tc)
        ids = jax.lax.broadcasted_iota(jnp.int32, d2_tile.shape, 0)
        idx = jnp.min(jnp.where(d2_tile == mn, ids, rows), axis=0,
                      keepdims=True)
        sel = ids == idx                                      # (rows, tc)
        cd = mn
        cx = jnp.sum(jnp.where(sel, cx_tile, 0.0), axis=0, keepdims=True)
        cy = jnp.sum(jnp.where(sel, cy_tile, 0.0), axis=0, keepdims=True)
        d2_tile = jnp.where(sel, _PAD_DIST2, d2_tile)
        for si in range(k):
            swap = cd < run_d[si]
            nd = jnp.where(swap, cd, run_d[si])
            nx = jnp.where(swap, cx, run_x[si])
            ny = jnp.where(swap, cy, run_y[si])
            cd = jnp.where(swap, run_d[si], cd)
            cx = jnp.where(swap, run_x[si], cx)
            cy = jnp.where(swap, run_y[si], cy)
            run_d[si], run_x[si], run_y[si] = nd, nx, ny
    for s in range(k):
        d2_ref[s:s + 1, :] = run_d[s]
        wx_ref[s:s + 1, :] = run_x[s]
        wy_ref[s:s + 1, :] = run_y[s]


def _tile_hit(circ_ref, bb_ref, j, i):
    """Does feature tile ``i``'s filter circle touch ped tile ``j``'s
    bounding box?  Empty tiles carry r2 = -1 (never hit); empty ped tiles
    carry inverted infinite boxes (gaps are +inf)."""
    minx = bb_ref[0, j]
    maxx = bb_ref[1, j]
    miny = bb_ref[2, j]
    maxy = bb_ref[3, j]
    gx = jnp.maximum(jnp.maximum(circ_ref[0, i] - maxx,
                                 minx - circ_ref[0, i]), 0.0)
    gy = jnp.maximum(jnp.maximum(circ_ref[1, i] - maxy,
                                 miny - circ_ref[1, i]), 0.0)
    return gx * gx + gy * gy <= circ_ref[2, i]


def _seg_topk_kernel(nd2_ref, circ_ref, bb_ref, ax, ay, ux, uy, il2, px, py,
                     d2_ref, wx_ref, wy_ref, *, tf, tc, k):
    """One (ped-tile, segment-feature-tile) top-k merge step."""
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        d2_ref[...] = jnp.full_like(d2_ref, _PAD_DIST2)
        wx_ref[...] = jnp.zeros_like(wx_ref)
        wy_ref[...] = jnp.zeros_like(wy_ref)

    @pl.when(_tile_hit(circ_ref, bb_ref, j, i))
    def _():
        dxa = px[...] - ax[...]                               # (tf, tc)
        dya = py[...] - ay[...]
        t = jnp.clip((dxa * ux[...] + dya * uy[...]) * il2[...], 0.0, 1.0)
        cx = ax[...] + t * ux[...]
        cy = ay[...] + t * uy[...]
        ddx = px[...] - cx
        ddy = py[...] - cy
        d2 = ddx * ddx + ddy * ddy
        d2 = jnp.where(d2 <= nd2_ref[0], d2, _PAD_DIST2)
        _merge_topk(d2, cx, cy, d2_ref, wx_ref, wy_ref, k=k, rows=tf)


def _chunk_topk_kernel(nd2_ref, circ_ref, bb_ref, bx, by, px, py,
                       d2_ref, wx_ref, wy_ref, *, g, tc, k):
    """One (ped-tile, point-tile) top-k merge step: a point tile bundles
    ``g`` 128-point chunks; each chunk's within-chunk closest point is one
    candidate (first-occurrence argmin, the reference's np.argmin rule)."""
    j = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        d2_ref[...] = jnp.full_like(d2_ref, _PAD_DIST2)
        wx_ref[...] = jnp.zeros_like(wx_ref)
        wy_ref[...] = jnp.zeros_like(wy_ref)

    @pl.when(_tile_hit(circ_ref, bb_ref, j, i))
    def _():
        dx = bx[...] - px[...]                                # (g*128, tc)
        dy = by[...] - py[...]
        d2 = (dx * dx + dy * dy).reshape(g, 128, tc)
        dmin = jnp.min(d2, axis=1)                            # (g, tc)
        ids = jax.lax.broadcasted_iota(jnp.int32, (g, 128, tc), 1)
        idx = jnp.min(jnp.where(d2 == dmin[:, None, :], ids, 128), axis=1)
        sel = ids == idx[:, None, :]
        wxc = jnp.sum(jnp.where(sel, bx[...].reshape(g, 128, 1), 0.0),
                      axis=1)
        wyc = jnp.sum(jnp.where(sel, by[...].reshape(g, 128, 1), 0.0),
                      axis=1)
        dmin = jnp.where(dmin <= nd2_ref[0], dmin, _PAD_DIST2)
        _merge_topk(dmin, wxc, wyc, d2_ref, wx_ref, wy_ref, k=k, rows=g)


def _stage_peds(pos_x, pos_y, alive, tc):
    n = pos_x.shape[0]
    n_pad = _round_up(max(n, tc), tc)
    live = jnp.ones((n,), bool) if alive is None else alive
    px = jnp.full((n_pad,), _PAD, jnp.float32).at[:n].set(
        pos_x.astype(jnp.float32))
    py = jnp.full((n_pad,), _PAD, jnp.float32).at[:n].set(
        pos_y.astype(jnp.float32))
    live_pad = jnp.zeros((n_pad,), bool).at[:n].set(live)
    bb = tile_bboxes(px, py, live_pad, tc).T                  # (4, n_tiles)
    return px, py, bb, n_pad


def _tile_circles(bminx, bmaxx, bminy, bmaxy, nonempty, tf, neigh_dist):
    """Union filter circle per feature tile from per-feature bboxes
    ((f_pad,) planes; padding rows carry inverted infinite boxes)."""
    nt = bminx.shape[0] // tf
    mx = jnp.where(nonempty, bminx, jnp.inf).reshape(nt, tf).min(axis=1)
    Mx = jnp.where(nonempty, bmaxx, -jnp.inf).reshape(nt, tf).max(axis=1)
    my = jnp.where(nonempty, bminy, jnp.inf).reshape(nt, tf).min(axis=1)
    My = jnp.where(nonempty, bmaxy, -jnp.inf).reshape(nt, tf).max(axis=1)
    any_real = nonempty.reshape(nt, tf).any(axis=1)
    ccx = jnp.where(any_real, 0.5 * (mx + Mx), 0.0)
    ccy = jnp.where(any_real, 0.5 * (my + My), 0.0)
    rad = jnp.sqrt(jnp.where(any_real,
                             jnp.square(0.5 * (Mx - mx))
                             + jnp.square(0.5 * (My - my)), 0.0))
    r2 = jnp.where(any_real, jnp.square(rad + neigh_dist), -1.0)
    return jnp.stack([ccx, ccy, r2]).astype(jnp.float32)      # (3, nt)


def _pallas_topk_call(kernel, prefetch, feat_planes, px, py, n_pad, grid,
                      blk_f, tc, interpret):
    pt_spec = pl.BlockSpec(blk_f, lambda j, i, *_: (i, 0),
                           memory_space=pltpu.VMEM)
    ped_spec = pl.BlockSpec((1, tc), lambda j, i, *_: (0, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((_KP, tc), lambda j, i, *_: (0, j),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(prefetch),
        grid=grid,
        in_specs=[pt_spec] * len(feat_planes) + [ped_spec] * 2,
        out_specs=(out_spec,) * 3,
    )
    f_elems = feat_planes[0].shape[0]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((_KP, n_pad), jnp.float32),) * 3,
        cost_estimate=pl.CostEstimate(
            flops=int(10 * f_elems * n_pad),
            bytes_accessed=int(4 * (len(feat_planes) * f_elems * grid[0]
                                    + 2 * n_pad * grid[1] + 3 * _KP * n_pad)),
            transcendentals=0),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*prefetch, *feat_planes, px.reshape(1, n_pad), py.reshape(1, n_pad))


def _seg_topk_pallas(pos_x, pos_y, feat, k, neigh_dist, alive=None,
                     interpret=False, feat_tile=128, ped_tile=512):
    f = feat.num_features
    n = pos_x.shape[0]
    tf, tc = feat_tile, ped_tile
    f_pad = _round_up(max(f, tf), tf)

    def plane(a, fill):
        return jnp.full((f_pad,), jnp.float32(fill)).at[:f].set(
            a.astype(jnp.float32)).reshape(f_pad, 1)

    planes = [plane(feat.ax, _PAD), plane(feat.ay, _PAD),
              plane(feat.ux, 0.0), plane(feat.uy, 0.0),
              plane(feat.il2, 0.0)]
    pad_b = jnp.full((f_pad - f,), jnp.inf, jnp.float32)
    ccx = feat.ccx.astype(jnp.float32)
    ccy = feat.ccy.astype(jnp.float32)
    rad = feat.rad.astype(jnp.float32)
    circ = _tile_circles(
        jnp.concatenate([ccx - rad, pad_b]),
        jnp.concatenate([ccx + rad, -pad_b]),
        jnp.concatenate([ccy - rad, pad_b]),
        jnp.concatenate([ccy + rad, -pad_b]),
        jnp.zeros((f_pad,), bool).at[:f].set(True), tf, neigh_dist)

    px, py, bb, n_pad = _stage_peds(pos_x, pos_y, alive, tc)
    nd2 = (jnp.asarray(neigh_dist, jnp.float32) ** 2).reshape(1)
    grid = (n_pad // tc, f_pad // tf)
    d2, wx, wy = _pallas_topk_call(
        functools.partial(_seg_topk_kernel, tf=tf, tc=tc, k=k),
        (nd2, circ, bb), planes, px, py, n_pad, grid, (tf, 1), tc, interpret)
    d2 = d2[:k, :n]
    return jnp.where(d2 < _PAD_DIST2, d2, jnp.inf), wx[:k, :n], wy[:k, :n]


def _chunk_topk_pallas(pos_x, pos_y, pset, k, neigh_dist, alive=None,
                       interpret=False, point_tile=1024, ped_tile=512):
    n = pos_x.shape[0]
    c, kk, _ = pset.points.shape
    assert kk == 128
    g = point_tile // 128
    tc = ped_tile
    p_total = c * kk
    p_pad = _round_up(max(p_total, point_tile), point_tile)

    fx = jnp.where(pset.valid, pset.points[..., 0], _PAD).reshape(-1)
    fy = jnp.where(pset.valid, pset.points[..., 1], _PAD).reshape(-1)
    fxp = jnp.full((p_pad,), _PAD, jnp.float32).at[:p_total].set(
        fx.astype(jnp.float32)).reshape(p_pad, 1)
    fyp = jnp.full((p_pad,), _PAD, jnp.float32).at[:p_total].set(
        fy.astype(jnp.float32)).reshape(p_pad, 1)

    # per-POINT valid-bbox planes -> per-tile union circles
    vmask = jnp.zeros((p_pad,), bool).at[:p_total].set(
        pset.valid.reshape(-1))
    circ = _tile_circles(
        jnp.where(vmask, fxp[:, 0], jnp.inf),
        jnp.where(vmask, fxp[:, 0], -jnp.inf),
        jnp.where(vmask, fyp[:, 0], jnp.inf),
        jnp.where(vmask, fyp[:, 0], -jnp.inf),
        vmask, point_tile, neigh_dist)

    px, py, bb, n_pad = _stage_peds(pos_x, pos_y, alive, tc)
    nd2 = (jnp.asarray(neigh_dist, jnp.float32) ** 2).reshape(1)
    grid = (n_pad // tc, p_pad // point_tile)
    d2, wx, wy = _pallas_topk_call(
        functools.partial(_chunk_topk_kernel, g=g, tc=tc, k=k),
        (nd2, circ, bb), [fxp, fyp], px, py, n_pad, grid,
        (point_tile, 1), tc, interpret)
    d2 = d2[:k, :n]
    return jnp.where(d2 < _PAD_DIST2, d2, jnp.inf), wx[:k, :n], wy[:k, :n]


def nearest_features_topk(pos_x, pos_y, src, k: int, neigh_dist,
                          alive=None, use_pallas: bool | None = None,
                          interpret: bool = False,
                          feat_tile: int = 128, point_tile: int = 1024,
                          ped_tile: int = 512):
    """The ``k`` nearest static wall features of each pedestrian.

    ``src``: a SegmentFeatures (analytic line segments) or ChunkedPointSet
    (sampled chunks; feature = one 128-point chunk's closest point).
    Returns ``(d2, wx, wy)`` planes of shape ``(k, N)``, distances
    ascending, ``d2 = inf`` marking empty slots (fewer than k features
    within ``neigh_dist``).

    ``use_pallas``: None = auto on TPU backends.  The jnp fallback
    materializes the (F, N) planes (ops/geometry) and reduces with
    :func:`~.geometry.k_smallest_features`; both paths select the same
    features with the same first-occurrence tie-breaking.
    """
    from ..env.pointsets import SegmentFeatures
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if k > _KP:
        raise ValueError(f"k must be <= {_KP}, got {k} (the running list "
                         f"rides an (8, tile) output block)")
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    if isinstance(src, SegmentFeatures):
        if use_pallas:
            return _seg_topk_pallas(pos_x, pos_y, src, k, neigh_dist,
                                    alive=alive, interpret=interpret,
                                    feat_tile=feat_tile, ped_tile=ped_tile)
        d2, wx, wy = feature_closest_planes(pos_x, pos_y, src, neigh_dist)
    else:
        if use_pallas and src.chunk_size == 128:
            return _chunk_topk_pallas(pos_x, pos_y, src, k, neigh_dist,
                                      alive=alive, interpret=interpret,
                                      point_tile=point_tile,
                                      ped_tile=ped_tile)
        d2, wx, wy = closest_point_per_chunk(pos_x, pos_y, src, neigh_dist,
                                             alive=alive, use_pallas=False)
    dfin = jnp.where(jnp.isfinite(d2), d2, 0.0)
    (swx, swy, sd2), valid = k_smallest_features(d2, (wx, wy, dfin), k)
    return jnp.where(valid, sd2, jnp.inf), swx, swy
