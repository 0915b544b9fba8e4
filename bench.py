#!/usr/bin/env python
"""Headline benchmark: agent-steps/sec headless (BASELINE.json).

Workloads (``BENCH_MODE``, all driver-capturable):

* ``ped`` (default) -- config #1: acceleration + Moussaid pedestrian forces,
  full mode/waypoint pipeline, N=10k.
* ``borders`` -- config #2: + border force over a street-grid wall point
  cloud at the reference's 0.1 m sampling.
* ``obstacles`` -- config #3: + static (parked-car grid) and dynamic
  (moving vehicles) obstacle forces.
* ``urban`` -- config #4: nav-graph-routed pedestrians on a synthetic
  street grid with curb borders, crosswalk mode transitions, gap-acceptance
  road crossing, and a reactive autopilot fleet (the full tick pipeline,
  run_simulation.py:47-132).
* ``ensemble`` -- config #5 shape: BENCH_BATCH (default 256) independent
  rollouts x N (default 1k) pedestrians vmapped in one launch; the value is
  the aggregate agent-steps/s.

Baseline is the driver-set north star of 1M agent-steps/sec/chip (the
reference itself is real-time paced at N*20 agent-steps/sec, BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Env: BENCH_N, BENCH_STEPS, BENCH_CUTOFF (meters; locality-sorted cutoff on
the Pallas path), BENCH_BATCH (ensemble only), BENCH_SYM ("0" disables the
symmetric launch for pre-symmetric A/B), BENCH_COMPACT, BENCH_TILES,
BENCH_ENV_ANALYTIC ("1" enables the analytic border tier), BENCH_LAW
("powerlaw" swaps the pair-force family to the Karamouzas-2014
time-to-collision law, "helbing" to the Helbing-Molnar-1995 elliptical
repulsion, "orca" to the van-den-Berg-2011 reciprocal-collision-avoidance
velocity law; rollout modes only), BENCH_ORCA_PURE ("1" with BENCH_LAW=orca
turns the soft border force OFF so walls act only as ORCA's hard half-plane
constraints -- pure RVO2 semantics), BENCH_MIX ("moussaid,powerlaw,orca" --
a MIXED-MODEL crowd: the slots split into equal contiguous chunks, each
perceiving the crowd through its own family via SpawnSchedule.law_id;
rollout modes only, mutually exclusive with BENCH_LAW), BENCH_GROUPS
("<frac>:<size>", e.g. "0.5:4" -- assign that fraction of the crowd into
social parties of that size and enable the Moussaid-2010 group force;
rollout modes only).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

MODES = ("ped", "borders", "obstacles", "urban", "ensemble")
MODE = os.environ.get("BENCH_MODE", "ped")
if MODE not in MODES:
    raise SystemExit(f"BENCH_MODE must be one of {'|'.join(MODES)}, got {MODE!r}")
N = int(os.environ.get("BENCH_N", 1_000 if MODE == "ensemble" else 10_000))
#: default 1000 for single-rollout modes: one jitted run() dispatch through
#: the axon remote runtime costs ~40 ms regardless of content (BENCH.md), so
#: a 100-step N=10k rollout would charge ~20% dispatch overhead to the
#: simulator; 1000 steps amortizes it below 2.5%.  The ensemble mode's
#: per-launch step is ~7 ms, so 100 steps already amortizes there.
STEPS = int(os.environ.get("BENCH_STEPS",
                           100 if MODE == "ensemble" else 1_000))
#: optional interaction cutoff in meters (see BENCH.md; >= the f32-exact
#: threshold it is NOT an approximation); unset/empty = exact all-pairs
CUTOFF = os.environ.get("BENCH_CUTOFF", "")
#: compacted pairwise-kernel grid (takes effect with BENCH_CUTOFF; exact —
#: see StepConfig.pallas_compact / BENCH.md).  Default ON via StepConfig;
#: "0" disables, "1" forces, optional "1:<max_surv>"
COMPACT = os.environ.get("BENCH_COMPACT", "")
#: pairwise-kernel tiles as "<row>x<col>" (default: StepConfig's 192x512;
#: very large N wants bigger tiles so the compact survivor table stays
#: SMEM-sized, see BENCH.md)
TILES = os.environ.get("BENCH_TILES", "")
#: Newton's-third-law symmetric launch (default on via StepConfig;
#: "0" disables for pre-symmetric A/B comparisons)
SYM = os.environ.get("BENCH_SYM", "")
#: analytic border geometry ("1" enables StepConfig.env_analytic: closest
#: point ON Douglas-Peucker-simplified segments instead of the reference's
#: 0.1 m sampled argmin -- see BENCH.md accuracy notes)
ENV_ANALYTIC = os.environ.get("BENCH_ENV_ANALYTIC", "")
BATCH = int(os.environ.get("BENCH_BATCH", 256))
BASELINE_AGENT_STEPS_PER_SEC = 1_000_000.0


def _sync(x):
    # force a device->host transfer: under the axon remote runtime,
    # block_until_ready alone has been observed not to block reliably
    import numpy as np
    return float(np.asarray(x).sum())


def run_rollout_mode():
    import dataclasses
    from carla_social_force_model_tpu.api.synthetic import (benchmark_bundle,
                                                            urban_bundle)
    from carla_social_force_model_tpu.models.stepper import make_rollout_fn

    if MODE == "urban":
        scene, params, cfg, state = urban_bundle(N, num_steps_hint=STEPS)
    else:
        scene, params, cfg, state = benchmark_bundle(
            N, with_borders=MODE in ("borders", "obstacles"),
            with_obstacles=MODE == "obstacles", num_steps_hint=STEPS)
    law = os.environ.get("BENCH_LAW", "")
    if law == "powerlaw":
        # swap the pair-force model family: Karamouzas 2014 time-to-
        # collision power law instead of the reference's Moussaid force
        params = dataclasses.replace(params, enable_pedestrian=False,
                                     enable_powerlaw=True)
    elif law == "helbing":
        # Helbing-Molnar 1995 elliptical repulsion (law="helbing")
        params = dataclasses.replace(params, enable_pedestrian=False,
                                     enable_ped_repulsive=True)
    elif law == "orca":
        # ORCA reciprocal collision avoidance (a velocity-projection law,
        # ops/orca.py): windowed Hilbert-band neighbors + exact LP.
        # BENCH_ORCA="<window>:<max_neighbors>" overrides the neighbor
        # knobs (window 0 or >= N selects the exact full-N neighbor pass).
        params = dataclasses.replace(params, enable_pedestrian=False,
                                     enable_orca=True)
        if os.environ.get("BENCH_ORCA"):
            w, k = (int(v) for v in os.environ["BENCH_ORCA"].split(":"))
            params = dataclasses.replace(
                params, orca=dataclasses.replace(
                    params.orca, window=w, max_neighbors=k))
        if os.environ.get("BENCH_ORCA_PURE") == "1":
            # pure RVO2 semantics: the soft border force OFF, walls act
            # only as hard half-plane constraints in the projection
            # (tests/test_orca.py::test_orca_corridor_counterflow_zero_
            # wall_penetration pins the confinement guarantee)
            params = dataclasses.replace(params, enable_border=False)
    elif law:
        raise SystemExit(
            f"BENCH_LAW must be powerlaw|helbing|orca, got {law!r}")
    mix = os.environ.get("BENCH_MIX", "")
    if mix:
        # mixed-model heterogeneous crowd: equal contiguous slot chunks,
        # one pair-force family each (models/spawn.LAW_IDS row masks)
        if law:
            raise SystemExit("BENCH_MIX and BENCH_LAW are mutually exclusive")
        import numpy as np
        from carla_social_force_model_tpu.models.spawn import LAW_IDS
        fams = [f.strip() for f in mix.split(",") if f.strip()]
        bad = [f for f in fams if f not in LAW_IDS]
        if bad or not fams:
            raise SystemExit(
                f"BENCH_MIX entries must be in {sorted(LAW_IDS)}, got {mix!r}")
        cap = scene.spawn.capacity
        law_arr = np.full(cap, -1, np.int32)
        for fam, chunk in zip(fams, np.array_split(np.arange(cap), len(fams))):
            law_arr[chunk] = LAW_IDS[fam]
        scene = dataclasses.replace(
            scene, spawn=dataclasses.replace(scene.spawn, law_id=law_arr))
        params = dataclasses.replace(
            params,
            enable_pedestrian="moussaid" in fams,
            enable_powerlaw="powerlaw" in fams,
            enable_ped_repulsive="helbing" in fams,
            enable_orca="orca" in fams)
    if os.environ.get("BENCH_GROUPS"):
        # Moussaid-2010 social parties on top of the pair force: the cost
        # is O(grouped members) gathers/scatter + (G, M) math
        import numpy as np
        from carla_social_force_model_tpu.models.groups import build_groups
        frac, size = os.environ["BENCH_GROUPS"].split(":")
        cap = scene.spawn.capacity
        k = int(float(frac) * cap)
        gid = np.full(cap, -1, np.int32)
        gid[:k] = np.arange(k) // int(size)
        scene = dataclasses.replace(
            scene, groups=build_groups(gid, max_members=int(size)))
        params = dataclasses.replace(params, enable_group=True)
    if CUTOFF:
        cfg = dataclasses.replace(cfg, interaction_cutoff=float(CUTOFF))
    if COMPACT:
        # "0" disables; "1" forces (an explicit max_surv bypasses the
        # 64-tile auto floor, so small N engages too); "1:<k>" sets the
        # survivor bound.  max_surv=0 would leave the auto gate in charge,
        # i.e. NOT force anything.
        ms = int(COMPACT.split(":")[1]) if ":" in COMPACT else 32
        cfg = dataclasses.replace(cfg, pallas_compact=COMPACT != "0",
                                  pallas_max_surv=0 if COMPACT == "0" else ms)
    if TILES:
        tr, tc = (int(v) for v in TILES.split("x"))
        cfg = dataclasses.replace(cfg, pallas_row_tile=tr,
                                  pallas_col_tile=tc)
    if SYM:
        cfg = dataclasses.replace(cfg, pallas_symmetric=SYM != "0")
    if ENV_ANALYTIC:
        cfg = dataclasses.replace(cfg, env_analytic=ENV_ANALYTIC != "0")
    if os.environ.get("BENCH_VMEM"):
        # Mosaic scoped-VMEM limit in MB; N >= ~4M needs > 32 (the
        # symmetric launch's (1, n_cols) column accumulators scale with N)
        cfg = dataclasses.replace(
            cfg, pallas_vmem_mb=int(os.environ["BENCH_VMEM"]))
    run = make_rollout_fn(scene, params, cfg, STEPS, record=False)

    def once(s):
        final, _ = run(s)
        final = final[0] if isinstance(final, tuple) else final
        return _sync(final.pos)

    once(state)  # warmup / compile
    best = min(_timed(once, state) for _ in range(3))
    # mixed runs encode the family NAMES (not just arity) so different
    # mixes of the same size produce distinct metric records; ORCA
    # neighbor-knob overrides are tagged the same way
    tag = f"_{law}" if law else (f"_mix-{'-'.join(fams)}" if mix else "")
    if law == "orca" and os.environ.get("BENCH_ORCA"):
        tag += "-w" + os.environ["BENCH_ORCA"].replace(":", "k")
    if law == "orca" and os.environ.get("BENCH_ORCA_PURE") == "1":
        tag += "-pure"
    if ENV_ANALYTIC and ENV_ANALYTIC != "0":
        # distinguish analytic-tier rows from their sampled-cloud twins in
        # bench_all.jsonl (same N/mode/law otherwise)
        tag += "-env"
    return N * STEPS / best, tag


def run_ensemble_mode():
    import dataclasses
    for knob in ("BENCH_LAW", "BENCH_MIX", "BENCH_GROUPS"):
        if os.environ.get(knob):
            # refuse rather than silently benchmark something else
            raise SystemExit(f"{knob} applies to rollout modes only")
    from carla_social_force_model_tpu.api.synthetic import (batched_crowds,
                                                            benchmark_bundle)
    from carla_social_force_model_tpu.parallel.sweeps import (
        make_ensemble_rollout)

    scene, params, cfg, _ = benchmark_bundle(N)
    if CUTOFF:
        cfg = dataclasses.replace(cfg, interaction_cutoff=float(CUTOFF))
    scene = dataclasses.replace(scene, spawn=batched_crowds(BATCH, N))
    run = make_ensemble_rollout(scene, params, cfg, STEPS)

    def once(s):
        finals, _ = run(s)
        return _sync(finals.pos)

    once(scene)
    best = min(_timed(once, scene) for _ in range(3))
    return BATCH * N * STEPS / best, f"_b{BATCH}"


def _timed(fn, arg):
    t0 = time.perf_counter()
    fn(arg)
    return time.perf_counter() - t0


def main():
    value, extra = (run_ensemble_mode() if MODE == "ensemble"
                    else run_rollout_mode())
    tag = "" if MODE == "ped" else f"_{MODE}"
    print(json.dumps({
        "metric": f"agent_steps_per_sec_n{N}{tag}{extra}",
        "value": round(value, 1),
        "unit": "agent-steps/s",
        "vs_baseline": round(value / BASELINE_AGENT_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
