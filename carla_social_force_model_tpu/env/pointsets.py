"""Padded, chunked point-cloud containers for borders and obstacles.

The reference stores borders/obstacle outlines as ragged Python lists of
numpy arrays and loops over pedestrians (forces.py:145-155, :217-229).  The
TPU-native layout packs *all* points of all segments (a segment = one border
or one obstacle outline) into a dense ``(num_chunks, chunk_size, 2)`` array
with a per-chunk segment id.  Ragged segment lengths are handled by splitting
each segment into fixed-size chunks and padding the tail; a segmented min
over chunks recovers the exact per-segment closest point (ops/geometry.py).

Tie-breaking matches the reference's ``np.argmin`` first-occurrence rule
because chunks preserve point order.
"""
from __future__ import annotations

from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static_field

#: coordinate written into padding slots (never the nearest point)
PAD_COORD = 1.0e8


@pytree_dataclass
class ChunkedPointSet:
    """A set of ``num_segments`` point-sampled outlines, chunked for TPU.

    ``centers``/``filter_radius`` drive the reference's coarse relevance
    filters: for sidewalk borders the section center/length pair
    (forces.py:149-151), for obstacles the center + perception threshold
    (forces.py:222-224).
    """

    points: jnp.ndarray        # (C, K, 2) f32, padded with PAD_COORD
    valid: jnp.ndarray         # (C, K) bool
    chunk_segment: jnp.ndarray  # (C,) int32 segment id per chunk
    centers: jnp.ndarray       # (S, 2) per-segment filter center
    filter_radius: jnp.ndarray  # (S,) per-segment filter radius
    num_segments: int = static_field()

    @property
    def num_chunks(self) -> int:
        return self.points.shape[0]

    @property
    def chunk_size(self) -> int:
        return self.points.shape[1]


@pytree_dataclass
class SegmentPointSet:
    """Segment-major point layout: one fixed-size row per segment.

    The fused environment-force kernels (ops/pallas_env.py) compute the
    per-segment closest point *and* the force inside one kernel, which
    requires each segment's points to be contiguous and uniformly sized:
    ``points[s]`` holds all sampled points of segment ``s`` padded with
    ``PAD_COORD`` to a common ``K`` (multiple of 128).  Unlike
    :class:`ChunkedPointSet` there is no chunk/segment indirection, so no
    segmented reduction or gather is ever needed downstream.
    """

    points: jnp.ndarray        # (S, K, 2) f32, PAD_COORD in padding slots
    centers: jnp.ndarray       # (S, 2) per-segment filter center
    filter_radius: jnp.ndarray  # (S,) per-segment filter radius
    num_segments: int = static_field()

    @property
    def points_per_segment(self) -> int:
        return self.points.shape[1]


def segment_major(pset: ChunkedPointSet | None,
                  max_points_per_segment: int = 4096
                  ) -> SegmentPointSet | None:
    """Repack a (host-side, concrete) :class:`ChunkedPointSet` into the
    segment-major layout, or None when a segment is too long (callers fall
    back to the chunked closest-point path) or the set is empty.

    Must run outside jit (concrete arrays); Scene builders call this once
    per scenario via models.stepper.prepare_scene.
    """
    if pset is None:
        return None
    pts = np.asarray(pset.points)
    valid = np.asarray(pset.valid)
    seg = np.asarray(pset.chunk_segment)
    s_count = pset.num_segments
    k_chunk = pts.shape[1]

    per_seg: list[np.ndarray] = [np.zeros((0, 2), pts.dtype)
                                 for _ in range(s_count)]
    for c in range(pts.shape[0]):
        v = valid[c]
        if not v.any():
            continue
        per_seg[seg[c]] = np.concatenate([per_seg[seg[c]], pts[c][v]], axis=0)

    longest = max((p.shape[0] for p in per_seg), default=0)
    if longest == 0 or longest > max_points_per_segment:
        return None
    k = -(-max(longest, 1) // k_chunk) * k_chunk
    out = np.full((s_count, k, 2), PAD_COORD, pts.dtype)
    for si, p in enumerate(per_seg):
        out[si, : p.shape[0]] = p
    return SegmentPointSet(
        points=jnp.asarray(out),
        centers=pset.centers,
        filter_radius=pset.filter_radius,
        num_segments=s_count,
    )


def build_chunked_pointset(
    point_lists: Sequence[np.ndarray],
    centers: np.ndarray,
    filter_radius: np.ndarray,
    chunk_size: int = 128,
    dtype=np.float32,
) -> ChunkedPointSet:
    """Pack ragged per-segment point arrays into a :class:`ChunkedPointSet`.

    ``point_lists[s]`` is an ``(P_s, 2)`` array of sampled outline points of
    segment ``s`` (may be empty).  Point order within a segment is preserved
    so closest-point tie-breaking matches the reference's ``np.argmin``.
    """
    num_segments = len(point_lists)
    chunks = []
    valids = []
    seg_ids = []
    for s, pts in enumerate(point_lists):
        pts = np.asarray(pts, dtype=dtype).reshape(-1, 2)
        n = pts.shape[0]
        if n == 0:
            continue
        n_chunks = -(-n // chunk_size)
        padded = np.full((n_chunks * chunk_size, 2), PAD_COORD, dtype=dtype)
        padded[:n] = pts
        v = np.zeros((n_chunks * chunk_size,), dtype=bool)
        v[:n] = True
        chunks.append(padded.reshape(n_chunks, chunk_size, 2))
        valids.append(v.reshape(n_chunks, chunk_size))
        seg_ids.append(np.full((n_chunks,), s, dtype=np.int32))

    if chunks:
        points = np.concatenate(chunks, axis=0)
        valid = np.concatenate(valids, axis=0)
        chunk_segment = np.concatenate(seg_ids, axis=0)
    else:
        points = np.full((1, chunk_size, 2), PAD_COORD, dtype=dtype)
        valid = np.zeros((1, chunk_size), dtype=bool)
        chunk_segment = np.zeros((1,), dtype=np.int32)
        num_segments = max(num_segments, 1)

    centers = np.asarray(centers, dtype=dtype).reshape(-1, 2)
    filter_radius = np.asarray(filter_radius, dtype=dtype).reshape(-1)
    if centers.shape[0] != num_segments or filter_radius.shape[0] != num_segments:
        # pad filter metadata for empty sets
        c = np.zeros((num_segments, 2), dtype=dtype)
        r = np.zeros((num_segments,), dtype=dtype)
        c[: centers.shape[0]] = centers
        r[: filter_radius.shape[0]] = filter_radius
        centers, filter_radius = c, r

    return ChunkedPointSet(
        points=jnp.asarray(points),
        valid=jnp.asarray(valid),
        chunk_segment=jnp.asarray(chunk_segment),
        centers=jnp.asarray(centers),
        filter_radius=jnp.asarray(filter_radius),
        num_segments=num_segments,
    )
