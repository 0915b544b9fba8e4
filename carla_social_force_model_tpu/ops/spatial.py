"""Spatial locality ordering for tile-skipping N-body kernels.

Sorting pedestrians along a Morton (Z-order) curve makes nearby agents land
in nearby kernel tiles, so tile-pair bounding boxes become tight and the
fused force kernel can skip tile pairs whose minimum distance exceeds the
interaction cutoff.  The force sum is permutation-invariant (up to f32
addition order), so sorting changes no semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy (not jnp) scalar: a module-level jnp constant would initialize the
# device backend at import time, before a CLI --platform override can apply
_MAX_KEY = np.uint32(0xFFFFFFFF)


def _part1by1(x):
    """Interleave 16-bit integer bits with zeros (Morton helper)."""
    x = x & 0x0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _quantize(c, alive, levels):
    lo = jnp.min(jnp.where(alive, c, jnp.inf))
    hi = jnp.max(jnp.where(alive, c, -jnp.inf))
    span = jnp.maximum(hi - lo, 1e-6)
    top = float(levels - 1)
    return jnp.clip((c - lo) / span * top, 0.0, top).astype(jnp.uint32)


_HILBERT_BITS = 15


def _hilbert_d(x, y, bits=_HILBERT_BITS):
    """Vectorized 2-D Hilbert index (the classic xy2d rotation walk,
    unrolled over ``bits`` levels; branchless)."""
    d = jnp.zeros_like(x)
    for level in range(bits - 1, -1, -1):
        s = jnp.uint32(1 << level)
        rx = ((x & s) > 0).astype(jnp.uint32)
        ry = ((y & s) > 0).astype(jnp.uint32)
        d = d + s * s * ((3 * rx) ^ ry)
        # rotate the quadrant: ry==0 -> (optionally flip) then swap axes
        swap = ry == 0
        flip = swap & (rx == 1)
        xf = jnp.where(flip, s - 1 - x, x)
        yf = jnp.where(flip, s - 1 - y, y)
        x = jnp.where(swap, yf, xf)
        y = jnp.where(swap, xf, yf)
    return d


def _morton_key(pos, alive, order: str = "morton"):
    """(N,) uint32 space-filling-curve keys; dead slots key to the maximum
    (sort last).  ``pos``: (N, 2) array or (x, y) plane tuple.

    ``order``: ``"morton"`` (Z-order, 16 bits/axis) or ``"hilbert"``
    (15 bits/axis -- strictly better worst-case locality: no Z-jumps, so
    per-tile bounding boxes of the sorted order are tighter and the cutoff
    kernel skips more tile pairs)."""
    from .vecmath import split_xy
    x, y = split_xy(pos)
    if order == "hilbert":
        key = _hilbert_d(_quantize(x, alive, 1 << _HILBERT_BITS),
                         _quantize(y, alive, 1 << _HILBERT_BITS))
    elif order == "morton":
        key = (_part1by1(_quantize(x, alive, 65536)) << 1) \
            | _part1by1(_quantize(y, alive, 65536))
    else:
        raise ValueError(f"unknown spatial order {order!r}")
    # an alive agent at the quantization corner would otherwise reach
    # _MAX_KEY (Morton of (65535, 65535)) and sort into the dead block --
    # clamp so "dead slots sort last" is a real invariant
    return jnp.where(alive, jnp.minimum(key, _MAX_KEY - jnp.uint32(1)),
                     _MAX_KEY)


def morton_order(pos, alive, order: str = "morton"):
    """Permutation sorting alive pedestrians along a space-filling curve
    (dead slots go last).  ``pos``: (N, 2) array or (x, y) plane tuple.
    Returns ``(perm, inv_perm)`` int32 arrays."""
    perm = jnp.argsort(_morton_key(pos, alive, order)).astype(jnp.int32)
    inv = jnp.argsort(perm).astype(jnp.int32)
    return perm, inv


def morton_sort(pos, alive, arrays, order: str = "morton"):
    """Curve-sort ``arrays`` (a tuple of (N,) planes) in ONE multi-operand
    ``lax.sort`` pass.

    Separate per-plane gathers ``a[perm]`` compile to ~10 ns/row loops
    (~0.45 ms/step at N=10k across the 5-6 staged planes); the co-sorted
    operands ride the sort's own permutation network instead.  Returns
    ``(sorted_arrays, inv_perm)`` with ``inv_perm`` (int32) scattering
    sorted-order results back to slot order (``out[inv]``).  Stable, so the
    order matches :func:`morton_order` exactly (tested).
    """
    key = _morton_key(pos, alive, order)
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort((key, iota) + tuple(arrays), num_keys=1,
                       is_stable=True)
    perm = out[1]
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    return out[2:], inv


def surv_table(hits, max_surv: int):
    """Compact each row's surviving column-tile indices to the front.

    ``hits``: (R, C) bool tile-pair hit matrix.  Returns ``(surv, fits)``:
    ``surv`` (R, max_surv) int32 of ascending surviving column indices with
    -1 padding, ``fits`` a scalar bool -- True iff no row overflows
    ``max_surv`` (callers ``lax.cond`` to their dense grid otherwise, so
    compaction is never lossy).  The ascending order makes a compacted
    kernel's accumulation order identical to the dense grid's, so results
    match bitwise.
    """
    counts = hits.sum(axis=1).astype(jnp.int32)
    order = jnp.argsort(~hits, axis=1, stable=True).astype(jnp.int32)
    slot = jnp.arange(max_surv, dtype=jnp.int32)
    surv = jnp.where(slot[None, :] < counts[:, None],
                     order[:, :max_surv], jnp.int32(-1))
    return surv, jnp.all(counts <= max_surv)


def tile_bboxes(x, y, alive, tile: int):
    """Per-tile bounding boxes of alive agents.

    ``x``/``y``/``alive``: (n_pad,) with n_pad a multiple of ``tile``.
    Returns (n_tiles, 4) f32 [min_x, max_x, min_y, max_y]; empty tiles get
    (+inf, -inf, +inf, -inf) so any distance test skips them.
    """
    n_tiles = x.shape[0] // tile
    xm = jnp.where(alive, x, jnp.inf).reshape(n_tiles, tile)
    xM = jnp.where(alive, x, -jnp.inf).reshape(n_tiles, tile)
    ym = jnp.where(alive, y, jnp.inf).reshape(n_tiles, tile)
    yM = jnp.where(alive, y, -jnp.inf).reshape(n_tiles, tile)
    return jnp.stack([xm.min(axis=1), xM.max(axis=1),
                      ym.min(axis=1), yM.max(axis=1)], axis=1)
