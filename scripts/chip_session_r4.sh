#!/usr/bin/env bash
# One-shot round-4 chip measurement session (run when the axon tunnel is up).
# Batches every queued BASELINE.md measurement; each python invocation pays
# the full compile (cross-process compile-cache keys are unstable here), so
# the multi-row script runs all workloads in ONE process.
set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p outputs/_bench
LOG=outputs/_bench/chip_session_r4_$(date +%s).log
{
  echo "=== 1/5 bench.py headline (B=1; expect >=0.879 pipelined) ==="
  timeout 3600 python bench.py

  echo "=== 2/5 bench.py B=4 (prompt_steps_per_sec row) ==="
  BENCH_B=4 timeout 3600 python bench.py

  echo "=== 3/5 workload rows (one process: sd_nerf mv_nerf conv3d_300k triplane) ==="
  timeout 10800 python scripts/bench_workloads.py sd_nerf mv_nerf conv3d_300k triplane

  echo "=== 4/5 sd_nerf reference-parity options (for the lever delta) ==="
  BENCH_COMPACT=0 BENCH_RESLICE=0 timeout 3600 \
      python scripts/bench_workloads.py sd_nerf

  echo "=== 5/5 mv_nerf unchunked attempt (compaction shrinks the program) ==="
  BENCH_CHUNK=0 timeout 3600 python scripts/bench_workloads.py mv_nerf
} 2>&1 | tee "$LOG"
echo "session log: $LOG"
