"""Component-level timing of the border/obstacle force path on the real TPU.

Breaks BASELINE configs #2/#3 (border / static+dynamic obstacle forces at
N=10k) into their pieces so optimization targets the measured wall, not the
assumed one.  One JSON line per measurement:

  {"what": "...", "n": ..., "ms": ...}

Components (each timed as a jitted ``lax.scan`` over ITERS iterations with a
position-perturbing carry, per the repo's benchmarking convention -- eager
per-call dispatch over the axon tunnel adds ~1 ms/call):

  * cp_kernel      -- the Pallas per-chunk distance scan only (dmin/idx)
  * cp_full        -- closest_point_per_segment (kernel + segmented reduce
                      + point gather)
  * border_force   -- the full border force (cp_full + filter + force math)
  * obstacle_force -- the full static-obstacle force
  * step2 / step3  -- one whole simulation step of configs #2 / #3

Usage: python tools/profile_borders.py [n]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 50


def _sync(x):
    import numpy as np
    return np.asarray(x)


def _scan_time(fn, pos, iters=ITERS):
    """Time fn(pos)->(N,*) under a scan whose carry perturbs pos each step."""
    import jax
    import jax.numpy as jnp

    def body(p, _):
        out = fn(p)
        p = p + 1e-6 * out[:, :2].astype(p.dtype)
        return p, None

    @jax.jit
    def run(p):
        p, _ = jax.lax.scan(body, p, None, length=iters)
        return p

    _sync(run(pos))  # compile + warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(pos))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    import jax
    import jax.numpy as jnp
    import numpy as np
    from carla_social_force_model_tpu.api.synthetic import benchmark_bundle
    from carla_social_force_model_tpu.models.stepper import simulation_step
    from carla_social_force_model_tpu.ops import forces
    from carla_social_force_model_tpu.ops.geometry import (
        closest_point_per_segment, _closest_point_pallas, segment_filter_mask)

    scene, params, cfg, state = benchmark_bundle(
        n, with_borders=True, with_obstacles=True, num_steps_hint=ITERS + 2)
    borders = scene.borders
    obst = scene.static_obstacles
    print(json.dumps({"what": "shape", "n": n,
                      "border_chunks": int(borders.num_chunks),
                      "border_segments": int(borders.num_segments),
                      "obstacle_chunks": int(obst.num_chunks),
                      "obstacle_segments": int(obst.num_segments)}),
          flush=True)

    rng = np.random.default_rng(0)
    extent = float(np.sqrt(n))
    pos = jnp.asarray(rng.uniform(-extent, extent, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    rad = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.ones((n,), bool)
    mode = jnp.zeros((n,), jnp.int32)

    # 1. kernel-only: per-chunk dmin/idx, reduced to (N,2) to keep scan shape
    def cp_kernel(p, pset):
        import functools
        from carla_social_force_model_tpu.ops import geometry as g
        # call the pallas path but only consume dmin/idx cheaply: replicate
        # the staging then sum -- approximated by running full and dropping
        # the gather is hard to isolate; instead time the raw pallas_call.
        return None

    # raw pallas_call timing: stage once outside, time only the call+sum
    for name, pset in (("border", borders), ("obstacle", obst)):
        from carla_social_force_model_tpu.env.pointsets import PAD_COORD
        c, k, _ = pset.points.shape
        fx = jnp.where(pset.valid, pset.points[..., 0], PAD_COORD).reshape(-1)
        fy = jnp.where(pset.valid, pset.points[..., 1], PAD_COORD).reshape(-1)

        def kern_only(p, pset=pset):
            d, pt, hp = _closest_point_pallas(p, pset)
            # consume everything so nothing is DCE'd
            return jnp.stack([d.sum(0), pt[..., 0].sum(0)], axis=-1)

        ms = _scan_time(kern_only, pos)
        print(json.dumps({"what": f"cp_full_{name}", "n": n,
                          "ms": round(ms, 3)}), flush=True)

    def bforce(p):
        return forces.border_force(p, mode, rad, alive, borders,
                                   params.border)

    print(json.dumps({"what": "border_force", "n": n,
                      "ms": round(_scan_time(bforce, pos), 3)}), flush=True)

    obs_vel = jnp.zeros((obst.num_segments, 2), jnp.float32)

    def oforce(p):
        return forces.obstacle_force(p, vel, rad, alive, obst, obs_vel,
                                     params.static_obstacle)

    print(json.dumps({"what": "obstacle_force", "n": n,
                      "ms": round(_scan_time(oforce, pos), 3)}), flush=True)

    # whole steps
    import dataclasses
    from carla_social_force_model_tpu.models.stepper import rollout

    for tag, with_obs in (("step2", False), ("step3", True)):
        sc, pr, cf, st = benchmark_bundle(
            n, with_borders=True, with_obstacles=with_obs,
            num_steps_hint=ITERS + 2)

        @jax.jit
        def run(s, sc=sc, pr=pr, cf=cf):
            final, _ = rollout(s, sc, pr, cf, ITERS, record=False)
            return final.pos

        _sync(run(st))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            _sync(run(st))
            best = min(best, time.perf_counter() - t0)
        print(json.dumps({"what": tag, "n": n,
                          "ms": round(best / ITERS * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
