#!/bin/bash
# Regenerate every headline table in BENCH.md from one invocation.
#
#   bash tools/bench_all.sh [section ...]     (default: all sections)
#
# Sections: headline borders urban cutoff bignum families orca groups ensemble
# Each row is ONE bench.py subprocess (CLAUDE.md: several large Pallas
# programs in one process have produced TPU backend INVALID_ARGUMENT
# errors), run sequentially (one JAX process at a time on this machine).
# Output: one JSON line per config, tagged by metric name, appended to
# stdout and bench_all.jsonl.  Run on the real TPU (no JAX_PLATFORMS
# override).  Full set takes ~1-2 h wall clock, dominated by first-compile
# times through the remote compile service; per-section runs are the
# usual workflow.
set -u
cd "$(dirname "$0")/.."
OUT=bench_all.jsonl

run() {
  echo "# $*"
  timeout 2400 env "$@" python bench.py | tee -a "$OUT" \
    || echo "{\"error\": \"$*\"}" | tee -a "$OUT"
}

# want <section> [selected...]: run the section when no selection was given
# or when it is in the selection ($1 must be excluded from the search — "$*"
# contains it, which made every section match whatever was asked for).
want() { local s="$1"; shift; [ $# -eq 0 ] || [ -z "$*" ] || [[ " $* " == *" $s "* ]]; }
SECTIONS=("$@")

# --- BENCH.md "Measured performance" headline table (config #1) ---------
if want headline "${SECTIONS[@]:-}"; then
  run BENCH_N=1000 BENCH_STEPS=2000
  run BENCH_N=10000
  run BENCH_N=50000
  run BENCH_N=50000 BENCH_CUTOFF=30
fi

# --- configs #2/#3 (border / obstacle point clouds) + analytic tier -----
if want borders "${SECTIONS[@]:-}"; then
  run BENCH_MODE=borders BENCH_N=10000
  run BENCH_MODE=obstacles BENCH_N=10000
  run BENCH_MODE=borders BENCH_N=10000 BENCH_ENV_ANALYTIC=1
fi

# --- config #4 (urban navigation) table ----------------------------------
if want urban "${SECTIONS[@]:-}"; then
  run BENCH_MODE=urban BENCH_N=10000
  run BENCH_MODE=urban BENCH_N=10000 BENCH_CUTOFF=30
  run BENCH_MODE=urban BENCH_N=10000 BENCH_ENV_ANALYTIC=1
  run BENCH_MODE=urban BENCH_N=10000 BENCH_CUTOFF=30 BENCH_ENV_ANALYTIC=1
fi

# --- "Optional interaction cutoff" table (O(N) at fixed density) ---------
if want cutoff "${SECTIONS[@]:-}"; then
  run BENCH_N=10000 BENCH_CUTOFF=30
  run BENCH_N=50000 BENCH_CUTOFF=30
  run BENCH_N=100000 BENCH_CUTOFF=30
fi

# --- big-N rows (minutes each; separate section) --------------------------
if want bignum "${SECTIONS[@]:-}"; then
  run BENCH_N=1000000 BENCH_CUTOFF=30 BENCH_STEPS=200
  run BENCH_N=2000000 BENCH_CUTOFF=30 BENCH_STEPS=100 BENCH_TILES=384x512
  run BENCH_N=4000000 BENCH_CUTOFF=30 BENCH_STEPS=50 BENCH_TILES=768x512 BENCH_VMEM=64
fi

# --- "Model families" table (power law / Helbing / ORCA + controls) ------
if want families "${SECTIONS[@]:-}"; then
  run BENCH_N=10000 BENCH_STEPS=1000                      # Moussaid control
  run BENCH_N=10000 BENCH_STEPS=1000 BENCH_CUTOFF=30
  run BENCH_LAW=powerlaw BENCH_N=10000
  run BENCH_LAW=powerlaw BENCH_N=10000 BENCH_CUTOFF=30
  run BENCH_LAW=helbing BENCH_N=10000
  run BENCH_LAW=helbing BENCH_N=10000 BENCH_CUTOFF=30
fi

# --- ORCA velocity-law tables (own section: the rows a statics/LP change
# --- invalidates; the sweep knob BENCH_ORCA=<window>:<K> rides bench.py) --
if want orca "${SECTIONS[@]:-}"; then
  run BENCH_LAW=orca BENCH_N=1000 BENCH_STEPS=2000
  run BENCH_LAW=orca BENCH_N=10000
  run BENCH_LAW=orca BENCH_N=50000
  run BENCH_MODE=borders BENCH_LAW=orca BENCH_N=1000 BENCH_STEPS=2000
  run BENCH_MODE=borders BENCH_LAW=orca BENCH_N=10000   # wall half-planes
  run BENCH_MODE=borders BENCH_LAW=orca BENCH_N=10000 BENCH_ORCA_PURE=1
  run BENCH_MODE=borders BENCH_LAW=orca BENCH_N=50000
  run BENCH_MODE=borders BENCH_LAW=orca BENCH_N=50000 BENCH_ENV_ANALYTIC=1
  run BENCH_MODE=borders BENCH_LAW=orca BENCH_N=50000 BENCH_ORCA_PURE=1 BENCH_ENV_ANALYTIC=1
  run BENCH_MODE=urban BENCH_LAW=orca BENCH_N=10000     # full crossing FSM
fi

# --- "Social-group force cost" table --------------------------------------
if want groups "${SECTIONS[@]:-}"; then
  run BENCH_N=10000 BENCH_GROUPS=0.5:4
  run BENCH_N=10000 BENCH_GROUPS=1.0:4
  run BENCH_N=10000 BENCH_CUTOFF=30 BENCH_GROUPS=0.5:4
fi

# --- config #5 ensemble / sweep -------------------------------------------
if want ensemble "${SECTIONS[@]:-}"; then
  run BENCH_MODE=ensemble
fi

echo "# bench_all done -> $OUT"
