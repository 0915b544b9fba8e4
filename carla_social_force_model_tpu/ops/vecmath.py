"""Branchless 2-D vector math primitives shared by all force kernels.

These are the TPU-native (masked, zero-safe, fixed-shape) equivalents of the
reference's numpy helpers (see /root/reference/stateutils.py:7-128): zero-safe
normalization, velocity capping, and signed 2-D angle differences with +-pi
wrapping.  Everything here is pure jnp, works under jit/vmap/shard_map, and is
written to be numerically identical to the reference math wherever the
reference is well-defined (zero norms map to zero directions, exactly as the
reference's ``normalize`` guard does).
"""
from __future__ import annotations

import jax.numpy as jnp

TWO_PI = 2.0 * jnp.pi


def split_xy(v):
    """``(x, y)`` planes of ``v``: a pass-through for an (x, y) tuple, the
    column split of an ``(..., 2)`` array.  The planar-interface convention:
    functions on the hot path accept either form and compute on planes
    (a size-2 minor dimension pads 2 -> 128 lanes on TPU)."""
    if isinstance(v, (tuple, list)):
        x, y = v
        return x, y
    return v[..., 0], v[..., 1]


def stack_xy(x, y):
    """Assemble an ``(..., 2)`` array from x/y planes (host-side views,
    record assembly -- never inside the per-step hot path)."""
    return jnp.stack([x, y], axis=-1)


def norm(v, axis=-1):
    """Euclidean norm along ``axis`` (no zero guard)."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def normalize(v, axis=-1):
    """Zero-safe normalize.

    Returns ``(unit_vectors, norms)``; vectors with zero norm yield a zero
    direction and a zero norm (reference: stateutils.py:78-92 replaces zero
    norms with 1 before dividing).
    """
    n = norm(v, axis=axis)
    safe = jnp.where(n == 0.0, 1.0, n)
    return v / jnp.expand_dims(safe, axis), n


def cap_velocity(v, max_speed):
    """Scale velocity vectors down so their speed does not exceed ``max_speed``.

    Mirrors reference stateutils.py:18-23 (zero speeds are guarded with 1 so
    zero vectors pass through unchanged).
    """
    speed = norm(v)
    safe = jnp.where(speed == 0.0, 1.0, speed)
    factor = jnp.minimum(1.0, max_speed / safe)
    return v * jnp.expand_dims(factor, -1)


def norm_xy(x, y):
    """Euclidean norm of planar components (no zero guard)."""
    return jnp.sqrt(x * x + y * y)


def normalize_xy(x, y):
    """Zero-safe planar normalize: ``(ux, uy, norm)`` with zero vectors
    mapping to zero directions (same guard as :func:`normalize`)."""
    n = norm_xy(x, y)
    inv = jnp.where(n == 0.0, 1.0, n)
    return x / inv, y / inv, n


def cap_velocity_xy(vx, vy, max_speed):
    """Planar :func:`cap_velocity` (same math on x/y planes)."""
    speed = norm_xy(vx, vy)
    safe = jnp.where(speed == 0.0, 1.0, speed)
    factor = jnp.minimum(1.0, max_speed / safe)
    return vx * factor, vy * factor


def left_normal(t):
    """Normal of 2-D vectors ``t`` rotated to the left: (x, y) -> (-y, x).

    Reference: forces.py:89-91.
    """
    return jnp.stack([-t[..., 1], t[..., 0]], axis=-1)


def wrap_angle(a):
    """Wrap angles to (-pi, pi] the way the reference does (single wrap).

    Reference stateutils.py:108-112 subtracts/adds 2*pi once for values just
    outside +-pi; since inputs here are differences of two atan2 results the
    difference is always within (-2*pi, 2*pi), so one wrap suffices.
    """
    a = jnp.where(a > jnp.pi, a - TWO_PI, a)
    a = jnp.where(a < -jnp.pi, a + TWO_PI, a)
    return a


def angle_diff_2d(vecs1, vecs2):
    """Signed angle(vecs1) - angle(vecs2) wrapped to [-pi, pi].

    Matches reference stateutils.py:95-128 (two atan2 calls + wrap).
    """
    a1 = jnp.arctan2(vecs1[..., 1], vecs1[..., 0])
    a2 = jnp.arctan2(vecs2[..., 1], vecs2[..., 0])
    return wrap_angle(a1 - a2)


def signed_angle(a, b):
    """Signed angle from ``b`` to ``a`` via a single atan2.

    Mathematically identical to :func:`angle_diff_2d` (up to fp rounding):
    atan2(cross(b, a), dot(a, b)).  Used by fused kernels where the two-atan2
    form would cost an extra transcendental.
    """
    cross = b[..., 0] * a[..., 1] - b[..., 1] * a[..., 0]
    dot = a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1]
    return jnp.arctan2(cross, dot)
