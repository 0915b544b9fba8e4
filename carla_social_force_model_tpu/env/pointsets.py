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
