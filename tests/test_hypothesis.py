"""Property-based tests (hypothesis): engine invariants over generated
inputs.

Complements tests/test_properties.py's hand-rolled fuzz cases with
shrinkable, generator-driven coverage of the pure kernels: the
space-filling-curve sort (ops/spatial.py), the vector math helpers
(ops/vecmath.py), and the segment-intersection predicate
(ops/geometry.py, the gap-acceptance primitive -- reference
check_traffic.py's crossing test).

Every test uses FIXED array shapes so each jitted callee compiles once per
session; hypothesis varies only the values.  Reference behaviors cited
inline where a property encodes one.
"""
import numpy as np
import jax.numpy as jnp
import pytest

try:
    from hypothesis import given, settings, HealthCheck, strategies as st
    from hypothesis.extra.numpy import arrays
except ImportError:  # pragma: no cover - hypothesis is in the image
    pytest.skip("hypothesis not installed", allow_module_level=True)

from carla_social_force_model_tpu.ops import vecmath
from carla_social_force_model_tpu.ops.geometry import segment_intersection
from carla_social_force_model_tpu.ops.spatial import (_hilbert_d, morton_order,
                                                      morton_sort, tile_bboxes)

N = 64  # fixed test shape: one compile per jitted callee

SETTINGS = dict(max_examples=25, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])

# no subnormals: XLA flushes them to zero (FTZ), so bbox/sort comparisons
# against numpy's unflushed arithmetic would differ by one denormal ulp
finite = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                   allow_infinity=False, allow_subnormal=False, width=32)
coords = arrays(np.float32, (N,), elements=finite)
masks = arrays(np.bool_, (N,), elements=st.booleans())


def _hilbert_scalar(x, y, bits):
    """Loop-based scalar oracle: the classic xy2d quadrant-rotation walk."""
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


@settings(**SETTINGS)
@given(st.lists(st.tuples(st.integers(0, 2**15 - 1),
                          st.integers(0, 2**15 - 1)),
                min_size=1, max_size=32))
def test_hilbert_matches_scalar_oracle(cells):
    xs = jnp.asarray([c[0] for c in cells], jnp.uint32)
    ys = jnp.asarray([c[1] for c in cells], jnp.uint32)
    got = np.asarray(_hilbert_d(xs, ys))
    want = np.asarray([_hilbert_scalar(x, y, 15) for x, y in cells],
                      np.uint32)
    np.testing.assert_array_equal(got, want)


def test_hilbert_adjacency_exhaustive():
    """Defining Hilbert property: consecutive curve indices are 4-adjacent
    grid cells (no Z-jumps -- the whole point of the tighter tile bboxes)."""
    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n, dtype=np.uint32),
                         np.arange(n, dtype=np.uint32), indexing="ij")
    d = np.asarray(_hilbert_d(jnp.asarray(xs.ravel()),
                              jnp.asarray(ys.ravel()), bits=bits))
    assert sorted(d) == list(range(n * n)), "not a bijection"
    order = np.argsort(d)
    l1 = (np.abs(np.diff(xs.ravel()[order].astype(int)))
          + np.abs(np.diff(ys.ravel()[order].astype(int))))
    assert (l1 == 1).all(), "consecutive Hilbert cells must be adjacent"


@settings(**SETTINGS)
@given(x=coords, y=coords, alive=masks,
       order=st.sampled_from(["morton", "hilbert"]))
def test_curve_sort_is_consistent_permutation(x, y, alive, order):
    """morton_sort == gather-by-morton_order; inv scatters back; dead slots
    sort last (the kernel's staging contract)."""
    xs, ys = jnp.asarray(x), jnp.asarray(y)
    al = jnp.asarray(alive)
    perm, inv = morton_order((xs, ys), al, order=order)
    (sx, sa), inv2 = morton_sort((xs, ys), al, (xs, al), order=order)
    np.testing.assert_array_equal(np.asarray(sx), np.asarray(x)[perm])
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(inv2))
    # scatter-back identity
    np.testing.assert_array_equal(np.asarray(sx)[np.asarray(inv2)], x)
    # alive block precedes the dead block in sorted order
    sa = np.asarray(sa)
    n_alive = int(alive.sum())
    assert sa[:n_alive].all() and not sa[n_alive:].any()


@settings(**SETTINGS)
@given(x=coords, y=coords, alive=masks)
def test_tile_bboxes_contain_alive_points(x, y, alive):
    bb = np.asarray(tile_bboxes(jnp.asarray(x), jnp.asarray(y),
                                jnp.asarray(alive), tile=16))
    for t in range(N // 16):
        sl = slice(t * 16, (t + 1) * 16)
        ax, ay = x[sl][alive[sl]], y[sl][alive[sl]]
        if ax.size == 0:
            assert bb[t, 0] > bb[t, 1]  # inverted box: never hit
            continue
        assert bb[t, 0] <= ax.min() and ax.max() <= bb[t, 1]
        assert bb[t, 2] <= ay.min() and ay.max() <= bb[t, 3]


@settings(**SETTINGS)
@given(vx=coords, vy=coords,
       cap=arrays(np.float32, (N,),
                  elements=st.floats(0.0, 100.0, width=32)))
def test_cap_velocity_norm_and_direction(vx, vy, cap):
    """|capped| <= cap, direction preserved, under-cap vectors untouched
    (reference stateutils capping rule)."""
    cx, cy = vecmath.cap_velocity_xy(jnp.asarray(vx), jnp.asarray(vy),
                                     jnp.asarray(cap))
    cx, cy = np.asarray(cx), np.asarray(cy)
    nrm = np.hypot(cx, cy)
    assert (nrm <= cap * (1 + 1e-5) + 1e-6).all()
    orig = np.hypot(vx, vy)
    under = orig <= cap
    np.testing.assert_allclose(cx[under], vx[under], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(cy[under], vy[under], rtol=1e-6, atol=1e-6)
    over = ~under & (orig > 1e-3)
    # capped vector stays parallel to the original (cross product ~ 0)
    cross = vx[over] * cy[over] - vy[over] * cx[over]
    assert np.abs(cross).max(initial=0.0) <= 1e-2 * np.maximum(
        orig[over], 1.0).max(initial=1.0)


@settings(**SETTINGS)
@given(a=arrays(np.float32, (N,),
                elements=st.floats(np.float32(-6.283), np.float32(6.283),
                                   width=32)))
def test_wrap_angle_range_and_congruence(a):
    """Single-wrap contract: inputs are differences of two atan2 results,
    i.e. within (-2*pi, 2*pi) (reference stateutils.py:108-112)."""
    w = np.asarray(vecmath.wrap_angle(jnp.asarray(a)))
    assert (w >= -np.pi - 1e-5).all() and (w <= np.pi + 1e-5).all()
    # congruent mod 2*pi
    k = np.round((a - w) / (2 * np.pi))
    np.testing.assert_allclose(w + 2 * np.pi * k, a, atol=5e-4)


@settings(**SETTINGS)
@given(x=coords, y=coords)
def test_normalize_xy_unit_or_zero(x, y):
    ux, uy, ln = vecmath.normalize_xy(jnp.asarray(x), jnp.asarray(y))
    ux, uy, ln = np.asarray(ux), np.asarray(uy), np.asarray(ln)
    nrm = np.hypot(x, y)
    big = nrm > 1e-3
    np.testing.assert_allclose(np.hypot(ux, uy)[big], 1.0, atol=1e-3)
    np.testing.assert_allclose(ln, nrm, rtol=1e-4, atol=1e-5)
    zero = nrm == 0.0
    assert (ux[zero] == 0.0).all() and (uy[zero] == 0.0).all()


seg_coord = st.floats(-100.0, 100.0, allow_nan=False, width=32)


@settings(**SETTINGS)
@given(st.lists(st.tuples(*[seg_coord] * 8), min_size=1, max_size=16))
def test_segment_intersection_matches_f64_orientation(segs):
    """The gap-acceptance crossing predicate agrees with an f64
    cross-product oracle away from degeneracy (reference
    check_traffic.py's path/vehicle-extent intersection)."""
    a = np.asarray(segs, np.float32)
    p0, p1 = a[:, 0:2], a[:, 2:4]
    q0, q1 = a[:, 4:6], a[:, 6:8]
    hit, _ = segment_intersection(jnp.asarray(p0), jnp.asarray(p1),
                                  jnp.asarray(q0), jnp.asarray(q1))
    hit = np.asarray(hit)

    P0, P1, Q0, Q1 = (v.astype(np.float64) for v in (p0, p1, q0, q1))
    d = P1 - P0
    e = Q1 - Q0
    denom = d[:, 0] * e[:, 1] - d[:, 1] * e[:, 0]
    w = Q0 - P0
    t_num = w[:, 0] * e[:, 1] - w[:, 1] * e[:, 0]
    u_num = w[:, 0] * d[:, 1] - w[:, 1] * d[:, 0]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = t_num / denom
        u = u_num / denom
    want = (np.abs(denom) > 1e-9) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
    # only judge examples safely away from f32/f64 disagreement: margin on
    # the parallel test and on the [0, 1] interval boundaries
    robust = (np.abs(denom) > 1e-3) & (np.abs(t - 0.5) < 0.49) \
        & (np.abs(u - 0.5) < 0.49)
    robust |= (np.abs(denom) > 1e-3) & ((t < -0.01) | (t > 1.01)
                                        | (u < -0.01) | (u > 1.01))
    np.testing.assert_array_equal(hit[robust], want[robust])
