"""bench.py supervisor: structured outage record + end-to-end tiny run.

Round-4 postmortem: with the remote-TPU tunnel down, bench.py died as an
unparseable traceback (BENCH_r04.json rc=1, parsed=null) — the driver
artifact lost the round's perf signal. The supervisor must print exactly one
machine-readable JSON line and exit 0 under BOTH tunnel states.
"""

import json
import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(env_overrides, timeout):
    env = dict(os.environ)
    env.update(env_overrides)
    return subprocess.run([sys.executable, BENCH], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=timeout)


def _last_json_line(stdout):
    lines = [l for l in stdout.strip().splitlines() if l.strip()]
    assert lines, f"no output: {stdout!r}"
    return json.loads(lines[-1])


def test_outage_emits_structured_json_and_exits_zero():
    # A 1-second probe timeout always expires (jax import alone is 30+ s),
    # simulating a hung tunnel deterministically.
    proc = _run_bench({"TGGCN_BENCH_PROBE_TIMEOUT_S": "1",
                       "TGGCN_BENCH_PROBE_ATTEMPTS": "1"}, timeout=120)
    assert proc.returncode == 0, proc.stderr
    record = _last_json_line(proc.stdout)
    assert record["metric"] == "mphoi_2ggcn_train_clips_per_sec"
    assert record["value"] is None
    assert record["error"] == "backend_unavailable"


def test_tiny_end_to_end_success_path():
    # Full supervisor -> probe -> child pipeline on the CPU backend with the
    # tiny workload: the relayed line must carry a real measurement.
    proc = _run_bench({"JAX_PLATFORMS": "cpu", "TGGCN_BENCH_TINY": "1"},
                      timeout=900)
    assert proc.returncode == 0, proc.stderr
    record = _last_json_line(proc.stdout)
    assert record["metric"] == "mphoi_2ggcn_train_clips_per_sec"
    assert record.get("error") is None
    assert record["value"] > 0
    # Tiny mode must not claim a ratio against the headline-shape baseline.
    assert record["vs_baseline"] is None
    assert len(record["trials_one_window_ms"]) == record["best_of"]
