#!/usr/bin/env python
"""Stage-level profile of the ORCA static-wall constraint path on hardware.

`BENCH_MODE=borders BENCH_LAW=orca` measured 0.39M agent-steps/s (round 4)
vs 6.5M for ORCA without walls and 3.9-4.8M for the Moussaid border-force
control -- ~22 ms/step of unexplained statics cost at N=10k.  This tool
times the suspects in isolation, iterated under a data-dependent
``lax.fori_loop`` carry (same methodology as tools/profile_orca.py):

* ``closest``   -- closest_point_per_segment over the street-grid border
                   set (the round-3 (S, N) segment path: full point scan +
                   (S, N)-row point gather + (S, N, 2) size-2-minor tensor)
* ``chunk``     -- closest_point_per_chunk (the round-4 replacement:
                   planar (C, N) outputs, in-kernel coordinate selection,
                   chunk-circle x ped-bbox tile skip)
* ``statics``   -- _static_constraints end-to-end (chunk pass + K-nearest
                   extraction + plane build)
* ``statics-feat`` -- _static_constraints over the round-5 analytic
                   segment-feature split (build_static_features + the
                   running-top-k kernel, ops/pallas_statics.py -- the
                   production feed)
* ``orca``      -- orca_velocities WITHOUT walls (control)
* ``orca+walls``-- orca_velocities WITH the border set constraining
* ``orca+walls-feat`` -- same, fed the feature split (production)

Usage:  python tools/profile_orca_statics.py [N] [iters] [sorted]

``sorted`` Hilbert-sorts the positions first -- the production pipeline
(orca_velocities) always hands _static_constraints SORTED planes, so the
ped-tile bboxes are tight and the chunk-circle skip actually prunes;
unsorted (default, matches the original measurements) is the worst case
where every bbox covers the whole domain.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from carla_social_force_model_tpu.api.synthetic import synthetic_borders
from carla_social_force_model_tpu.models.params import OrcaParams
from carla_social_force_model_tpu.ops.geometry import closest_point_per_segment
from carla_social_force_model_tpu.ops.orca import (_static_constraints,
                                                   orca_velocities)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 200
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
    def run(carry):
        return jax.lax.fori_loop(0, ITERS, lambda _, c: stage(c), carry)
    return run


def main():
    rng = np.random.default_rng(0)
    ext = float(np.sqrt(N)) * 0.7
    borders = synthetic_borders(ext)
    print(f"ORCA statics profile: N={N}, segments={borders.num_segments}, "
          f"chunks={borders.points.shape[0]}, iters={ITERS}, "
          f"backend={jax.default_backend()}")

    px = jnp.asarray(rng.uniform(-ext, ext, N), jnp.float32)
    py = jnp.asarray(rng.uniform(-ext, ext, N), jnp.float32)
    if "sorted" in sys.argv[3:]:
        from carla_social_force_model_tpu.ops.spatial import morton_sort
        (px, py), _ = morton_sort((px, py), jnp.ones((N,), bool),
                                  (px, py), order="hilbert")
        print("  (positions Hilbert-sorted -- production tile locality)")
    vx = jnp.asarray(rng.uniform(-1.5, 1.5, N), jnp.float32)
    vy = jnp.asarray(rng.uniform(-1.5, 1.5, N), jnp.float32)
    r = jnp.full((N,), 0.3, jnp.float32)
    alive = jnp.ones((N,), bool)
    vmax = jnp.full((N,), 2.0, jnp.float32)
    exempt = jnp.zeros((N,), bool)
    p = OrcaParams()

    def closest_stage(c):
        pos = jnp.stack([c[0], c[1]], axis=-1)
        dist, point, has = closest_point_per_segment(pos, borders)
        d = jnp.sum(dist * 1e-12, axis=0)
        return c[0] + d, c[1] + d

    timed("closest", loop(closest_stage), (px, py))

    def chunk_stage(c):
        from carla_social_force_model_tpu.ops.geometry import (
            closest_point_per_chunk)
        d2, wx, wy = closest_point_per_chunk(c[0], c[1], borders,
                                             p.neighbor_dist, alive=alive)
        d = jnp.sum(jnp.where(jnp.isfinite(d2), d2, 0.0) * 1e-12, axis=0)
        return c[0] + d, c[1] + d

    timed("chunk", loop(chunk_stage), (px, py))

    def statics_stage(c):
        ptx, pty, nx, ny, valid = _static_constraints(
            c[0], c[1], r, exempt, alive, borders, p.max_statics,
            p.tau_static, DT, p.neighbor_dist)
        d = jnp.sum(ptx * 1e-12, axis=-1)
        return c[0] + d, c[1] + d

    timed("statics", loop(statics_stage), (px, py))

    # round-5 production feed: the analytic segment-feature split (exact
    # closest points on DP segments via the running-top-k Pallas kernel,
    # chunk sampling only for geometry that does not simplify)
    from carla_social_force_model_tpu.env.pointsets import (
        build_static_features)
    feats = build_static_features(borders)
    nseg = feats.seg.num_features if feats.seg is not None else 0
    nrest = feats.rest.points.shape[0] if feats.rest is not None else 0
    print(f"  (feature split: {nseg} analytic segments + {nrest} "
          f"sampled chunks)")

    def statics_feat_stage(c):
        ptx, pty, nx, ny, valid = _static_constraints(
            c[0], c[1], r, exempt, alive, feats, p.max_statics,
            p.tau_static, DT, p.neighbor_dist)
        d = jnp.sum(ptx * 1e-12, axis=-1)
        return c[0] + d, c[1] + d

    timed("statics-feat", loop(statics_feat_stage), (px, py))

    def orca_stage(c):
        ovx, ovy = orca_velocities((c[0], c[1]), (vx, vy), r, alive,
                                   (c[0], c[1]), vmax, p, DT)
        return c[0] + ovx * 1e-12, c[1] + ovy * 1e-12

    timed("orca", loop(orca_stage), (px, py))

    def orca_walls_stage(c):
        ovx, ovy = orca_velocities((c[0], c[1]), (vx, vy), r, alive,
                                   (c[0], c[1]), vmax, p, DT,
                                   borders=borders, static_exempt=exempt)
        return c[0] + ovx * 1e-12, c[1] + ovy * 1e-12

    timed("orca+walls", loop(orca_walls_stage), (px, py))

    def orca_walls_feat_stage(c):
        ovx, ovy = orca_velocities((c[0], c[1]), (vx, vy), r, alive,
                                   (c[0], c[1]), vmax, p, DT,
                                   borders=feats, static_exempt=exempt)
        return c[0] + ovx * 1e-12, c[1] + ovy * 1e-12

    timed("orca+walls-feat", loop(orca_walls_feat_stage), (px, py))


if __name__ == "__main__":
    main()
