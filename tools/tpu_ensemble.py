"""Ensemble-rollout throughput on the real chip (BASELINE config #5 shape).

One JSON line per variant; each variant runs in its own subprocess (several
large Pallas programs in one process can fail with INVALID_ARGUMENT on this
runtime -- see CLAUDE.md).

Variants: full (vmapped rollout, fused Pallas pairwise kernel), pipeline
(pedestrian force disabled -- isolates the non-kernel per-step cost), jnp
(XLA N x N path under the vmap).

Usage: python tools/tpu_ensemble.py [BATCHxN] [steps]
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_variant(variant, batch, n, steps):
    import dataclasses
    import numpy as np
    from carla_social_force_model_tpu.api.synthetic import (batched_crowds,
                                                            benchmark_bundle)
    from carla_social_force_model_tpu.parallel.sweeps import (
        make_ensemble_rollout)

    scene, params, cfg, _ = benchmark_bundle(n)
    if variant == "pipeline":
        params = dataclasses.replace(params, enable_pedestrian=False)
    cfg = dataclasses.replace(cfg, use_pallas=variant == "full")
    spawn = batched_crowds(batch, n)
    scene = dataclasses.replace(scene, spawn=spawn)
    run = make_ensemble_rollout(scene, params, cfg, steps)
    finals, _ = run(scene)
    np.asarray(finals.pos)  # force transfer (block_until_ready unreliable)
    t0 = time.perf_counter()
    finals, _ = run(scene)
    np.asarray(finals.pos)
    dt = time.perf_counter() - t0
    return {"what": f"ensemble_{variant}", "batch": batch, "n": n,
            "ms_per_step": round(dt / steps * 1e3, 3),
            "agent_steps_per_s": round(batch * n * steps / dt)}


def main():
    shape = sys.argv[1] if len(sys.argv) > 1 else "256x1000"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    batch, n = (int(v) for v in shape.split("x"))
    if os.environ.get("ENSEMBLE_VARIANT"):
        print(json.dumps(run_variant(os.environ["ENSEMBLE_VARIANT"], batch,
                                     n, steps)), flush=True)
        return
    for variant in ("full", "pipeline", "jnp"):
        env = dict(os.environ, ENSEMBLE_VARIANT=variant)
        try:
            r = subprocess.run([sys.executable, os.path.abspath(__file__),
                                shape, str(steps)], env=env,
                               capture_output=True, text=True, timeout=1200)
        except subprocess.TimeoutExpired:
            # the SIGKILLed child may wedge the TPU tunnel for a while
            # (CLAUDE.md); report and keep going -- later variants will
            # retry against whatever state the tunnel is in
            print(json.dumps({"what": f"ensemble_{variant}", "ok": False,
                              "err": "timeout (1200s)"}), flush=True)
            continue
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        print(lines[-1] if lines else json.dumps(
            {"what": f"ensemble_{variant}", "ok": False,
             "err": r.stderr[-160:]}), flush=True)


if __name__ == "__main__":
    main()
