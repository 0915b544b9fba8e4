"""Env-kernel tile sweep for the ANALYTIC border tier on the urban config.

The analytic layout packs gs = env_point_tile/8 sections per point tile
(urban: 320 sections -> ~3 tiles at the default 512), so the tile-skip
granularity is much coarser than the sampled layout's -- this sweep checks
whether smaller point tiles (finer skipping) or the compacted grid buy
anything on BENCH_MODE=urban + BENCH_ENV_ANALYTIC=1 + 30 m cutoff.

One subprocess per config (several large Pallas programs in one process
have produced TPU INVALID_ARGUMENT errors on this machine).

Usage: python tools/tpu_env_analytic_sweep.py
"""
import dataclasses
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def one(cfg_str):
    ped_tile, point_tile, compact = cfg_str.split(":")
    import numpy as np
    from carla_social_force_model_tpu.api.synthetic import urban_bundle
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn

    n, steps = 10_000, 100
    scene, params, cfg, state = urban_bundle(n, num_steps_hint=steps)
    cfg = dataclasses.replace(
        cfg, env_analytic=True, interaction_cutoff=30.0,
        env_ped_tile=int(ped_tile), env_point_tile=int(point_tile),
        env_compact=compact == "1",
        env_max_surv=8 if compact == "1" else 0)
    run = make_rollout_fn(scene, params, cfg, steps, record=False)

    def once():
        final, _ = run(state)
        final = final[0] if isinstance(final, tuple) else final
        return float(np.asarray(final.pos).sum())

    once()
    best = min((lambda t0: (once(), time.perf_counter() - t0)[1])(
        time.perf_counter()) for _ in range(3))
    print(f"RESULT {ped_tile}x{point_tile} compact={compact}: "
          f"{1000 * best / steps:.3f} ms/step, "
          f"{n * steps / best / 1e6:.2f}M agent-steps/s", flush=True)


def main():
    if os.environ.get("SWEEP_ONE"):
        one(os.environ["SWEEP_ONE"])
        return
    configs = ["512:512:0", "512:256:0", "512:128:0", "512:64:0",
               "256:256:0", "512:128:1", "512:256:1"]
    for c in configs:
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=dict(os.environ, SWEEP_ONE=c),
                           capture_output=True, text=True, timeout=1800)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
        if r.returncode != 0:
            print(f"{c}: FAILED\n{r.stderr[-400:]}", flush=True)


if __name__ == "__main__":
    main()
