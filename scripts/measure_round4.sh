#!/usr/bin/env bash
# The round-4 measurement queue, runnable the moment the axon tunnel is up.
# One process per config (the TPU compile-cache keys are nondeterministic
# across processes, so splitting a config across processes recompiles);
# bench_workloads.py already runs all its rows inside ONE process.
#
#   bash scripts/measure_round4.sh [logdir]
#
# Emits one JSON line per row to stdout and a full log per step to $LOG.
set -uo pipefail
cd "$(dirname "$0")/.."

LOG=${1:-outputs/_measure_r4}
mkdir -p "$LOG"
echo "[measure_round4] logging to $LOG"

run() { # name, cmd...
  local name=$1; shift
  echo "[measure_round4] >>> $name : $*"
  timeout "${MEASURE_TIMEOUT:-3600}" "$@" 2>"$LOG/$name.err" \
    | tee "$LOG/$name.out" || echo "[measure_round4] $name FAILED rc=$?"
}

# 1. Headline (Hyper-iNGP north-star step, B=1). Expect >= 0.879 it/s.
run headline_b1 python bench.py

# 2. Per-chip prompt-throughput row (VERDICT r3 #8).
run headline_b4 env BENCH_B=4 python bench.py

# 3. All six workload rows in one process: sd_nerf/mv_nerf with the r4
#    compaction+reslice levers (targets >= 0.3 it/s), conv3d_300k (never
#    yet measured), triplane retime (unchunked retry below).
run workloads python scripts/bench_workloads.py

# 4. Parity-option checks for the single-prompt rows (reference semantics:
#    no compaction, tcnn 16x2 slicing) — the honest comparison row.
run sd_nerf_parity env BENCH_COMPACT=0 BENCH_RESLICE=0 BENCH_PROP_LEVELS=0 \
    python scripts/bench_workloads.py sd_nerf mv_nerf

# 5. Unchunked retries (r2/r3: small ray chunks because bigger chunks
#    500'd the axon remote-compile helper; compaction shrinks the program).
run unchunked_retry env BENCH_CHUNK=0 \
    python scripts/bench_workloads.py mv_nerf triplane

# 6. Quality smoke, full architecture (QUALITY_TINY=0), dry mode unless
#    converted weights exist (QUALITY.md).
run quality_smoke env QUALITY_TINY=0 QUALITY_STEPS=30 \
    bash scripts/quality_smoke.sh

echo "[measure_round4] done; summarize into BASELINE.md"
