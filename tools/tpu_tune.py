"""TPU tile-size + throughput tuning for the fused pedestrian-force kernel.

Runs on the real chip (axon).  One JSON line per measurement:
  {"what": "kernel", "n": ..., "tr": ..., "tc": ..., "ms": ..., "ok": ...}
  {"what": "rollout", "n": ..., "steps_per_s": ..., "agent_steps_per_s": ...}

Usage: python tools/tpu_tune.py [kernel|rollout|cutoff|all]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import numpy as np
    return np.asarray(x)  # force transfer (block_until_ready unreliable here)


def time_kernel(n, tr, tc, steps=30, cutoff=None, order="morton"):
    import jax
    import jax.numpy as jnp
    from carla_social_force_model_tpu.models.params import MoussaidParams
    from carla_social_force_model_tpu.ops.pallas_forces import (
        pedestrian_force_pallas, pedestrian_force_pallas_sorted)
    import numpy as np

    rng = np.random.default_rng(0)
    side = max(10.0, (n / 0.4) ** 0.5)  # ~0.4 peds/m^2
    pos = jnp.asarray(rng.uniform(0, side, (n, 2)), jnp.float32)
    vel = jnp.asarray(rng.uniform(-2, 2, (n, 2)), jnp.float32)
    rad = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.ones((n,), bool)
    p = MoussaidParams()

    if cutoff is None:
        fn = jax.jit(lambda a, b: pedestrian_force_pallas(
            a, b, rad, alive, p, row_tile=tr, col_tile=tc))
    else:
        fn = jax.jit(lambda a, b: pedestrian_force_pallas_sorted(
            a, b, rad, alive, p, cutoff=cutoff, row_tile=tr, col_tile=tc,
            spatial_order=order))
    out = fn(pos, vel)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(pos, vel)
    _sync(out)
    dt = (time.perf_counter() - t0) / steps
    return dt * 1e3


def time_rollout(n, tr, tc, steps=200, cutoff=None, forces="ped"):
    import dataclasses
    import jax
    from carla_social_force_model_tpu.api.synthetic import benchmark_bundle
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn

    kw = {}
    if forces == "borders":
        kw = dict(with_borders=True)
    elif forces == "obstacles":
        kw = dict(with_borders=True, with_obstacles=True)
    scene, params, cfg, state = benchmark_bundle(n, **kw)
    cfg = dataclasses.replace(cfg, use_pallas=True, pallas_row_tile=tr,
                              pallas_col_tile=tc, interaction_cutoff=cutoff)
    run = make_rollout_fn(scene, params, cfg, steps, record=False)
    final, _ = run(state)
    _sync(final.pos)
    t0 = time.perf_counter()
    final, _ = run(state)
    _sync(final.pos)
    dt = time.perf_counter() - t0
    return steps / dt, n * steps / dt


def time_env_rollout(n, ped_tile, point_tile, steps=100, forces="borders"):
    import dataclasses
    from carla_social_force_model_tpu.api.synthetic import benchmark_bundle
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn

    kw = dict(with_borders=True)
    if forces == "obstacles":
        kw["with_obstacles"] = True
    scene, params, cfg, state = benchmark_bundle(n, **kw)
    cfg = dataclasses.replace(cfg, use_pallas=True, env_ped_tile=ped_tile,
                              env_point_tile=point_tile)
    run = make_rollout_fn(scene, params, cfg, steps, record=False)
    final, _ = run(state)
    _sync(final.pos)
    t0 = time.perf_counter()
    final, _ = run(state)
    _sync(final.pos)
    dt = time.perf_counter() - t0
    return steps / dt, n * steps / dt


def time_sort(n, steps=50):
    """Morton-sort share: the fused 8-operand lax.sort + inverse-permutation
    build that the cutoff path pays every step (ops/spatial.morton_sort)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from carla_social_force_model_tpu.ops.spatial import morton_sort

    rng = np.random.default_rng(0)
    side = max(10.0, (n / 0.4) ** 0.5)
    px = jnp.asarray(rng.uniform(0, side, n), jnp.float32)
    py = jnp.asarray(rng.uniform(0, side, n), jnp.float32)
    vx = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    vy = jnp.asarray(rng.uniform(-2, 2, n), jnp.float32)
    rad = jnp.full((n,), 0.3, jnp.float32)
    alive = jnp.ones((n,), bool)

    @jax.jit
    def run(px, py):
        def body(c, _):
            arrs, inv = morton_sort((px + c, py), alive,
                                    (px, py, vx, vy, rad, alive))
            return c + arrs[0][0] * 0 + inv[0] * 0, None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=steps)
        return c

    _sync(run(px, py))
    t0 = time.perf_counter()
    _sync(run(px, py))
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "kernel"
    if what == "sort":
        for n in (10_000, 50_000, 100_000):
            ms = time_sort(n)
            print(json.dumps({"what": "sort", "n": n, "ms": round(ms, 3)}),
                  flush=True)
        return
    if what == "env":
        # one SUBPROCESS per config: several large Pallas programs in one
        # process produce spurious INVALID_ARGUMENT TPU backend errors on
        # this runtime (see CLAUDE.md environment gotchas)
        import subprocess
        forces = os.environ.get("ENV_FORCES", "borders")
        if os.environ.get("ENV_ONE_CONFIG"):
            pt, kt = (int(v) for v in
                      os.environ["ENV_ONE_CONFIG"].split("x"))
            sps, aps = time_env_rollout(10_000, pt, kt, forces=forces)
            print(json.dumps({"what": f"env_{forces}", "ped_tile": pt,
                              "point_tile": kt,
                              "steps_per_s": round(sps, 1),
                              "agent_steps_per_s": round(aps)}),
                  flush=True)
            return
        for pt in (256, 512, 1024):
            for kt in (512, 1024, 2048):
                env = dict(os.environ, ENV_ONE_CONFIG=f"{pt}x{kt}")
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "env"],
                    env=env, capture_output=True, text=True, timeout=900)
                line = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")]
                if line:
                    print(line[-1], flush=True)
                else:
                    print(json.dumps({"what": f"env_{forces}",
                                      "ped_tile": pt, "point_tile": kt,
                                      "ok": False,
                                      "err": r.stderr[-160:]}), flush=True)
        return
    if what in ("kernel", "all"):
        # TUNE_N sizes the sweep (tile optima shift with N: defaults were
        # tuned at 10k, VERDICT r2 asked for a 50k-specific sweep);
        # TUNE_CUTOFF sweeps the Morton-sorted cutoff kernel instead.
        # One SUBPROCESS per config (see the env mode note): at large N a
        # second Pallas program in the same process reliably dies with
        # INVALID_ARGUMENT on this runtime.
        import subprocess
        tune_cutoff = (float(os.environ["TUNE_CUTOFF"])
                       if os.environ.get("TUNE_CUTOFF") else None)
        n = int(os.environ.get("TUNE_N", 10_000))
        if os.environ.get("KERNEL_ONE_CONFIG"):
            tr, tc = (int(v) for v in
                      os.environ["KERNEL_ONE_CONFIG"].split("x"))
            order = os.environ.get("TUNE_ORDER", "hilbert")
            ms = time_kernel(n, tr, tc, cutoff=tune_cutoff, order=order)
            print(json.dumps({"what": "kernel", "n": n, "tr": tr, "tc": tc,
                              "cutoff": tune_cutoff, "order": order,
                              "ms": round(ms, 3), "ok": True}), flush=True)
            return
        if tune_cutoff is not None:
            # cutoff path: smaller tiles skip at finer granularity (the
            # per-pair cutoff keeps any tiling exact); sweep down to the
            # (8-sublane, 128-lane) floor
            configs = ((64, 128), (64, 256), (128, 128), (128, 256),
                       (128, 512), (192, 256), (192, 512), (256, 256),
                       (256, 512), (512, 512))
        else:
            configs = ((192, 512), (256, 512), (512, 512), (256, 1024),
                       (512, 1024), (1024, 512), (512, 2048), (1024, 1024))
        for tr, tc in configs:
            env = dict(os.environ, KERNEL_ONE_CONFIG=f"{tr}x{tc}")
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "kernel"],
                env=env, capture_output=True, text=True, timeout=1800)
            line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if line:
                print(line[-1], flush=True)
            else:
                print(json.dumps({"what": "kernel", "n": n, "tr": tr,
                                  "tc": tc, "ok": False,
                                  "err": r.stderr[-160:]}), flush=True)
    if what in ("rollout", "all"):
        best = os.environ.get("TILES", "512x1024")
        tr, tc = (int(v) for v in best.split("x"))
        for n, steps in ((1000, 500), (10_000, 200), (50_000, 40)):
            try:
                sps, aps = time_rollout(n, tr, tc, steps)
                print(json.dumps({"what": "rollout", "n": n,
                                  "steps_per_s": round(sps, 1),
                                  "agent_steps_per_s": round(aps)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"what": "rollout", "n": n, "ok": False,
                                  "err": str(e)[:160]}), flush=True)
    if what in ("cutoff", "all"):
        best = os.environ.get("TILES", "512x1024")
        tr, tc = (int(v) for v in best.split("x"))
        for n, steps in ((50_000, 40), (100_000, 20)):
            try:
                sps, aps = time_rollout(n, tr, tc, steps, cutoff=30.0)
                print(json.dumps({"what": "rollout_cutoff30", "n": n,
                                  "steps_per_s": round(sps, 1),
                                  "agent_steps_per_s": round(aps)}),
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"what": "rollout_cutoff30", "n": n,
                                  "ok": False, "err": str(e)[:160]}),
                      flush=True)


if __name__ == "__main__":
    main()
