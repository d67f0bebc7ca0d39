"""Driver contract of bench.py: ONE parsable JSON line on stdout, always.

The round driver runs `python bench.py` and parses a single JSON object
(metric/value/unit/vs_baseline). Every failure mode must degrade to a
structured-error line — never a bare traceback, never silence:

- no usable accelerator -> {"error": "tpu_unavailable", "value": 0.0}
- measurement stall (hung remote compile) -> watchdog kills the bounded
  child, retries once in a fresh process, then emits
  {"error": "measurement_stalled", "value": 0.0}

These run bench.py as a real subprocess with the TPU plugin disabled, so
they are fast (no compile) and never touch the chip/tunnel.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(extra_env, timeout=300):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",   # never touch the TPU tunnel from tests
        XLA_FLAGS="",              # single host device (see e2e matrix)
        BENCH_PROBE_TIMEOUT="60",
        BENCH_PROBE_BACKOFF="1",
        **extra_env,
    )
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=timeout)


def _parse_single_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {lines!r}"
    obj = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in obj, f"missing {key!r} in {obj}"
    return obj


def test_bench_emits_structured_error_without_tpu():
    """CPU-only probe (BENCH_ALLOW_CPU unset) -> tpu_unavailable JSON."""
    r = _run_bench({"BENCH_ALLOW_CPU": "0"})
    assert r.returncode == 0, r.stderr[-2000:]
    obj = _parse_single_json_line(r.stdout)
    assert obj["error"] == "tpu_unavailable"
    assert obj["value"] == 0.0


def test_bench_watchdog_times_out_stalled_measurement():
    """A measurement that exceeds BENCH_ATTEMPT_TIMEOUT is killed and
    retried once; both stalls -> measurement_stalled JSON (the r5 hung
    remote-compile failure mode, which the backend probe cannot see)."""
    r = _run_bench({"BENCH_ALLOW_CPU": "1",
                    # far below the CPU build time, so both attempts stall
                    "BENCH_ATTEMPT_TIMEOUT": "8"})
    assert r.returncode == 0, r.stderr[-2000:]
    obj = _parse_single_json_line(r.stdout)
    assert obj["error"] == "measurement_stalled"
    assert obj["value"] == 0.0
    assert "attempt 2" in obj["detail"]["note"]
