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

_MAX_KEY = jnp.uint32(0xFFFFFFFF)


def _part1by1(x):
    """Interleave 16-bit integer bits with zeros (Morton helper)."""
    x = x & 0x0000FFFF
    x = (x | (x << 8)) & 0x00FF00FF
    x = (x | (x << 4)) & 0x0F0F0F0F
    x = (x | (x << 2)) & 0x33333333
    x = (x | (x << 1)) & 0x55555555
    return x


def _morton_key(pos, alive):
    """(N,) uint32 Z-order keys; dead slots key to the maximum (sort
    last).  ``pos``: (N, 2) array or (x, y) plane tuple."""
    from .vecmath import split_xy
    x, y = split_xy(pos)

    def quant(c):
        lo = jnp.min(jnp.where(alive, c, jnp.inf))
        hi = jnp.max(jnp.where(alive, c, -jnp.inf))
        span = jnp.maximum(hi - lo, 1e-6)
        return jnp.clip((c - lo) / span * 65535.0,
                        0.0, 65535.0).astype(jnp.uint32)

    key = (_part1by1(quant(x)) << 1) | _part1by1(quant(y))
    return jnp.where(alive, key, _MAX_KEY)


def morton_order(pos, alive):
    """Permutation sorting alive pedestrians along a Z-order curve (dead
    slots go last).  ``pos``: (N, 2) array or (x, y) plane tuple.  Returns
    ``(perm, inv_perm)`` int32 arrays."""
    perm = jnp.argsort(_morton_key(pos, alive)).astype(jnp.int32)
    inv = jnp.argsort(perm).astype(jnp.int32)
    return perm, inv


def morton_sort(pos, alive, arrays):
    """Morton-sort ``arrays`` (a tuple of (N,) planes) in ONE multi-operand
    ``lax.sort`` pass.

    Separate per-plane gathers ``a[perm]`` compile to ~10 ns/row loops
    (~0.45 ms/step at N=10k across the 5-6 staged planes); the co-sorted
    operands ride the sort's own permutation network instead.  Returns
    ``(sorted_arrays, inv_perm)`` with ``inv_perm`` (int32) scattering
    sorted-order results back to slot order (``out[inv]``).  Stable, so the
    order matches :func:`morton_order` exactly (tested).
    """
    key = _morton_key(pos, alive)
    n = key.shape[0]
    iota = jnp.arange(n, dtype=jnp.int32)
    out = jax.lax.sort((key, iota) + tuple(arrays), num_keys=1,
                       is_stable=True)
    perm = out[1]
    inv = jnp.zeros((n,), jnp.int32).at[perm].set(iota)
    return out[2:], inv


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
