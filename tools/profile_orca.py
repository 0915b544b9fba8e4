#!/usr/bin/env python
"""Stage-level profile of the ORCA velocity law (ops/orca.py) on hardware.

Times each pipeline stage in isolation by iterating it inside one jitted
``lax.fori_loop`` with a data-dependent carry (so XLA cannot CSE the loop
away and the ~40 ms axon dispatch cost amortizes over ITERS iterations):

* ``sort``      -- Hilbert locality sort of the 10 state planes
* ``neighbors`` -- windowed candidate build (roll shifts) + K-nearest
                   masked min-extraction passes
* ``halfplanes``-- the ORCA half-plane construction for all (agent, K) pairs
* ``lp``        -- the candidate-enumeration LP (solve_orca_lp)
* ``unsort``    -- the inverse-permutation row gather back to slot order
                   (the one row-indexed gather on the step path)
* ``full``      -- orca_velocities end-to-end (sanity: ~= sum of stages)

Usage:  python tools/profile_orca.py [N] [window] [K] [iters]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from carla_social_force_model_tpu.models.params import OrcaParams
from carla_social_force_model_tpu.ops.orca import (_k_nearest,
                                                   _window_neighbors,
                                                   orca_halfplane,
                                                   orca_velocities,
                                                   solve_orca_lp)
from carla_social_force_model_tpu.ops.spatial import morton_sort

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
WINDOW = int(sys.argv[2]) if len(sys.argv) > 2 else 64
K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
ITERS = int(sys.argv[4]) if len(sys.argv) > 4 else 200
DT = 0.05


def timed(name, fn, *args):
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = jax.jit(fn)(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).sum())
    dt = (time.perf_counter() - t0) / ITERS
    print(f"  {name:<12} {dt * 1e3:8.3f} ms/step")
    return dt


def loop(stage):
    """Iterate ``stage(carry) -> carry`` ITERS times under fori_loop."""
    def run(carry):
        return jax.lax.fori_loop(0, ITERS, lambda _, c: stage(c), carry)
    return run


def main():
    rng = np.random.default_rng(0)
    ext = float(np.sqrt(N))  # ~1 ped / m^2
    px = jnp.asarray(rng.uniform(-ext, ext, N), jnp.float32)
    py = jnp.asarray(rng.uniform(-ext, ext, N), jnp.float32)
    vx = jnp.asarray(rng.uniform(-1.5, 1.5, N), jnp.float32)
    vy = jnp.asarray(rng.uniform(-1.5, 1.5, N), jnp.float32)
    r = jnp.full((N,), 0.3, jnp.float32)
    alive = jnp.ones((N,), bool)
    vmax = jnp.full((N,), 2.0, jnp.float32)
    p = OrcaParams(window=WINDOW, max_neighbors=K)
    print(f"ORCA stage profile: N={N}, window={WINDOW}, K={K}, "
          f"{ITERS} iterations, backend={jax.default_backend()}")

    # -- sort ---------------------------------------------------------------
    planes = (px, py, vx, vy, r, px, py, vmax, alive.astype(jnp.uint8),
              jnp.zeros_like(alive).astype(jnp.uint8))

    def sort_stage(c):
        s, inv = morton_sort((c[0], c[1]), alive, c)
        return tuple(jnp.asarray(a, pl.dtype) + 0
                     for a, pl in zip(s, c))  # keep dtypes, force use

    t_sort = timed("sort", loop(sort_stage), planes)

    sorted_planes, inv = morton_sort((px, py), alive, planes)
    (ex, ey, evx, evy, er, eprx, epry, evmax, sa, _) = sorted_planes
    salive = sa.astype(bool)

    # -- neighbors (window build + K extraction) ----------------------------
    def neigh_stage(c):
        ex_, ey_ = c
        nx_, ny_, nvx, nvy, nr, valid = _window_neighbors(
            ex_, ey_, evx, evy, er, salive, WINDOW, K, p.neighbor_dist)
        # data-dependent carry: perturb positions by a tiny function of the
        # output so the loop body cannot be hoisted
        d = jnp.sum(nx_ * 1e-12, axis=-1)
        return ex_ + d, ey_ + d

    t_neigh = timed("neighbors", loop(neigh_stage), (ex, ey))

    nx_, ny_, nvx, nvy, nr, valid = _window_neighbors(
        ex, ey, evx, evy, er, salive, WINDOW, K, p.neighbor_dist)

    # -- half-plane construction --------------------------------------------
    def hp_stage(c):
        ux, uy, hx, hy = orca_halfplane(
            nx_ - c[..., None], ny_ - ey[..., None],
            evx[..., None] - nvx, evy[..., None] - nvy,
            er[..., None] + nr, p.tau, DT)
        return c + jnp.sum(ux * 1e-12, axis=-1)

    t_hp = timed("halfplanes", loop(hp_stage), ex)

    ux, uy, hx, hy = orca_halfplane(
        nx_ - ex[..., None], ny_ - ey[..., None],
        evx[..., None] - nvx, evy[..., None] - nvy,
        er[..., None] + nr, p.tau, DT)
    ptx = evx[..., None] + 0.5 * ux
    pty = evy[..., None] + 0.5 * uy

    # -- LP -------------------------------------------------------------------
    def lp_stage(c):
        ovx, ovy = solve_orca_lp(c, epry, ptx, pty, hx, hy, valid, evmax)
        return c + ovx * 1e-12

    t_lp = timed("lp", loop(lp_stage), eprx)

    # -- unsort gather ---------------------------------------------------------
    def unsort_stage(c):
        return c[..., inv] * (1.0 + 1e-12)

    t_un = timed("unsort", loop(unsort_stage), ex)

    # -- end-to-end -------------------------------------------------------------
    def full_stage(c):
        ovx, ovy = orca_velocities((c[0], c[1]), (vx, vy), r, alive,
                                   (c[0], c[1]), vmax, p, DT)
        return (c[0] + ovx * 1e-12, c[1] + ovy * 1e-12)

    t_full = timed("full", loop(full_stage), (px, py))
    staged = t_sort + t_neigh + t_hp + t_lp + t_un
    print(f"  {'sum(stages)':<12} {staged * 1e3:8.3f} ms/step "
          f"(full {t_full * 1e3:.3f})")
    print(f"  agent-steps/s at this stage mix: {N / t_full:,.0f}")


if __name__ == "__main__":
    main()
