#!/usr/bin/env python
"""Headline benchmark: agent-steps/sec at N=10k headless (BASELINE.json).

Workload: acceleration + Moussaid pedestrian forces, full mode/waypoint
pipeline, jitted ``lax.scan`` rollout on one chip.  Baseline is the
driver-set north star of 1M agent-steps/sec/chip (the reference itself is
real-time paced at N*20 agent-steps/sec, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N = int(os.environ.get("BENCH_N", 10_000))
STEPS = int(os.environ.get("BENCH_STEPS", 100))
#: optional interaction cutoff in meters (approximate mode, see BENCH.md);
#: unset/empty = exact all-pairs reference semantics
CUTOFF = os.environ.get("BENCH_CUTOFF", "")
#: BASELINE.json workload: "ped" (config #1, default), "borders" (#2,
#: + street-grid border force), "obstacles" (#3, + static/dynamic obstacles)
MODE = os.environ.get("BENCH_MODE", "ped")
if MODE not in ("ped", "borders", "obstacles"):
    raise SystemExit(f"BENCH_MODE must be ped|borders|obstacles, got {MODE!r}")
BASELINE_AGENT_STEPS_PER_SEC = 1_000_000.0


def main():
    import dataclasses
    import jax
    from carla_social_force_model_tpu.api.synthetic import benchmark_bundle
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn

    import numpy as np

    scene, params, cfg, state = benchmark_bundle(
        N, with_borders=MODE in ("borders", "obstacles"),
        with_obstacles=MODE == "obstacles", num_steps_hint=STEPS)
    if CUTOFF:
        cfg = dataclasses.replace(cfg, interaction_cutoff=float(CUTOFF))
    run = make_rollout_fn(scene, params, cfg, STEPS, record=False)

    def run_to_completion(s):
        final, _ = run(s)
        # force a device->host transfer: under the axon remote runtime,
        # block_until_ready alone has been observed not to block reliably
        return float(np.asarray(final.pos).sum())

    run_to_completion(state)  # warmup / compile
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_to_completion(state)
        times.append(time.perf_counter() - t0)
    best = min(times)

    agent_steps = N * STEPS
    value = agent_steps / best
    tag = "" if MODE == "ped" else f"_{MODE}"
    print(json.dumps({
        "metric": f"agent_steps_per_sec_n{N}{tag}",
        "value": round(value, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(value / BASELINE_AGENT_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
