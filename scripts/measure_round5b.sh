#!/usr/bin/env bash
# Round-5 follow-up retries for the rows that failed or looked anomalous in
# the main queue (scripts/measure_round5.sh):
#   - eval_512: compile-helper 500 at chunk 65536 -> retry 16384, then 8192
#   - sd_nerf_256: 500 at remat+chunk4096 -> ladder 2048, then 1024
#   - mv_nerf parity: 500 unchunked (no compaction at B=4 doesn't fit) ->
#     chunk 2048 (the r2 parity-mode shape)
#   - headline B=2: pipelined 0.1423 < synced 0.3719 is not physical ->
#     repeat to test reproducibility
#   - conv3d loss NaN at step 20 -> per-step metric readback diagnosis row
#
#   bash scripts/measure_round5b.sh [logdir]
set -uo pipefail
cd "$(dirname "$0")/.."

LOG=${1:-outputs/_measure_r5}
mkdir -p "$LOG/rows" "$LOG/rows_parity" "$LOG/rows_diag"
echo "[measure_round5b] logging to $LOG"

run() { # name, cmd...  (always runs; these are retries)
  local name=$1; shift
  echo "[measure_round5b] >>> $name : $*"
  timeout "${MEASURE_TIMEOUT:-5400}" "$@" 2>"$LOG/$name.err" \
    | tee "$LOG/$name.out" || echo "[measure_round5b] $name FAILED rc=$?"
}

ok() { # row json has a result and no error?
  [ -s "$1" ] && ! grep -q '"error"' "$1"
}

# 1. eval_512 at smaller eval-render chunks (the 65536-ray chunk 500'd).
for chunk in 16384 8192; do
  ok "$LOG/rows/eval_512.json" && break
  run "eval_512_c$chunk" env BENCH_EVAL_CHUNK=$chunk \
      BENCH_RESULTS="$LOG/rows" python scripts/bench_workloads.py eval_512
done

# 2. sd_nerf_256 ladder: remat stays ON (row default); shrink the ray chunk.
for chunk in 2048 1024; do
  ok "$LOG/rows/sd_nerf_256.json" && break
  run "sd_nerf_256_c$chunk" env BENCH_CHUNK_256=$chunk \
      BENCH_RESULTS="$LOG/rows" python scripts/bench_workloads.py sd_nerf_256
done

# 3. mv_nerf reference-parity options, ray-chunk 2048 (unchunked 500'd:
#    parity disables compaction, so B=4 x 256 full samples/ray).
ok "$LOG/rows_parity/mv_nerf.json" || \
run parity_mv_c2048 env BENCH_COMPACT=0 BENCH_RESLICE=0 BENCH_PROP_LEVELS=0 \
    BENCH_INTERP=Linear BENCH_CHUNK=2048 \
    BENCH_RESULTS="$LOG/rows_parity" \
    python scripts/bench_workloads.py mv_nerf

# 4. headline B=2 repeat (anomaly check).
run headline_b2_repeat env BENCH_B=2 python bench.py

# 5. conv3d NaN diagnosis: per-step metric readback (timing meaningless in
#    this mode -> separate rows dir so the good timing row is not clobbered).
run conv3d_diag env BENCH_PRINT_LOSS=1 BENCH_STEPS=20 \
    BENCH_RESULTS="$LOG/rows_diag" python scripts/bench_workloads.py conv3d

echo "[measure_round5b] done"
