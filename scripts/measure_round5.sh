#!/usr/bin/env bash
# The round-5 measurement queue. One process per config (TPU compile-cache
# keys are nondeterministic across processes); bench_workloads.py runs its
# rows inside ONE process, resumable via BENCH_RESUME=1 (finished rows are
# skipped on relaunch — VERDICT r4 #3). Default windows are 20 timed steps
# everywhere (VERDICT r4 #7).
#
#   bash scripts/measure_round5.sh [logdir]
set -uo pipefail
cd "$(dirname "$0")/.."

LOG=${1:-outputs/_measure_r5}
mkdir -p "$LOG"
echo "[measure_round5] logging to $LOG"

run() { # name, cmd...  (skippable on relaunch once a clean result exists;
        # the workloads step is exempt — its per-row resume is finer-grained)
  local name=$1; shift
  if [ "$name" != workloads ] && [ -s "$LOG/$name.out" ] && \
     grep -q '"' "$LOG/$name.out" && ! grep -q '"error"' "$LOG/$name.out"; then
    echo "[measure_round5] <<< $name already done, skipping"
    return 0
  fi
  echo "[measure_round5] >>> $name : $*"
  timeout "${MEASURE_TIMEOUT:-5400}" "$@" 2>"$LOG/$name.err" \
    | tee "$LOG/$name.out" || echo "[measure_round5] $name FAILED rc=$?"
}

# 1. All 7 workload rows, never-measured first (conv3d, conv3d_300k,
#    sd_nerf_256 lead the default order), 20-step windows, resumable.
MEASURE_TIMEOUT=14400 run workloads env BENCH_RESUME=1 \
    BENCH_RESULTS="$LOG/rows" python scripts/bench_workloads.py

# 2. Per-chip prompt-throughput curve (VERDICT r4 #1). The pinned-chunk
#    B=4 run first (4096-ray chunks = the measured-known-to-fit B=1
#    program shape), then the ladder runs that probe bigger programs.
run headline_b4_c4096 env BENCH_B=4 BENCH_CHUNK=4096 python bench.py
run headline_b2 env BENCH_B=2 python bench.py
run headline_b4 env BENCH_B=4 python bench.py

# 3. Fresh B=1 headline at the 20-step window.
run headline_b1 python bench.py

# 4. Parity-option rows for the single-prompt workloads (reference
#    semantics: no compaction, tcnn 16x2 slicing, trilinear).
run parity env BENCH_COMPACT=0 BENCH_RESLICE=0 BENCH_PROP_LEVELS=0 \
    BENCH_INTERP=Linear BENCH_RESULTS="$LOG/rows_parity" \
    python scripts/bench_workloads.py sd_nerf mv_nerf

# 5. 512² eval-render rays/sec (refreshes the r2-era microbench row).
run eval_512 env BENCH_RESULTS="$LOG/rows" \
    python scripts/bench_workloads.py eval_512

# 6. Quality smoke to completion (dry/tiny mode; similarity.txt +
#    recall.txt on record — VERDICT r4 missing #1). Serialized after the
#    chip rows: this box has ONE CPU core and concurrent host work
#    distorts the pipelined timing windows (measured: sd_nerf pipelined
#    0.61 vs synced 0.83 while pytest ran at nice -19).
run quality bash scripts/quality_smoke.sh

echo "[measure_round5] done; summarize into BASELINE.md"
