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

from ..env.pointsets import ChunkedPointSet

_INF = jnp.inf
_BIG_I32 = jnp.int32(2**31 - 1)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def closest_point_per_segment(pos, pset: ChunkedPointSet, max_group_elems: int = 4_000_000):
    """Per (segment, pedestrian) closest outline point.

    Args:
      pos: ``(N, 2)`` pedestrian positions.
      pset: chunked point set with ``S`` segments.
      max_group_elems: cap on ``chunk_group_points * N`` to bound the
        intermediate ``(G, K, N)`` distance tensor.

    Returns:
      ``(dist, point, has_point)`` with shapes ``(S, N)``, ``(S, N, 2)``,
      ``(S, N)``; ``has_point`` is False where a segment has no valid points.
      Tie-breaking is the reference's first-occurrence ``argmin``.
    """
    n = pos.shape[0]
    c, k, _ = pset.points.shape
    s = pset.num_segments

    # chunks per lax.map group, bounded by the (G, K, N) intermediate
    g = max(1, min(c, max_group_elems // max(1, k * n)))
    c_pad = _round_up(c, g)

    pts = jnp.concatenate(
        [pset.points, jnp.zeros((c_pad - c, k, 2), pset.points.dtype)], axis=0)
    val = jnp.concatenate(
        [pset.valid, jnp.zeros((c_pad - c, k), bool)], axis=0)
    pts_g = pts.reshape(c_pad // g, g, k, 2)
    val_g = val.reshape(c_pad // g, g, k)

    def per_group(args):
        p_g, v_g = args  # (G, K, 2), (G, K)
        diff = p_g[:, :, None, :] - pos[None, None, :, :]        # (G, K, N, 2)
        d2 = jnp.sum(diff * diff, axis=-1)                        # (G, K, N)
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


def segment_filter_mask(pos, pset: ChunkedPointSet):
    """Coarse per-(segment, ped) relevance filter: ``|pos - center| < radius``.

    Matches the reference's border section filter (forces.py:149-151) and the
    obstacle perception filter (forces.py:222-224), both strict ``<``.
    """
    diff = pos[None, :, :] - pset.centers[:, None, :]          # (S, N, 2)
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    return dist < pset.filter_radius[:, None]


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
