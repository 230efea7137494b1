"""bench.py outage resilience (the BENCH_r03 rc=1 failure mode).

The driver runs ``python bench.py`` once per round against a tunnel
that can be down for hours; these tests simulate the outage with
BENCH_PROBE_CMD and assert the artifact contract: stdout is exactly
ONE parseable JSON line, carrying either the measurement or an
``"error"`` key — never a bare traceback.
"""

import fcntl
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout=120):
    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, cwd=REPO, env=env)


def _last_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line, got: {stdout!r}"
    return json.loads(lines[0])


def test_permanent_outage_emits_error_json(tmp_path):
    r = _run({"BENCH_PROBE_CMD": "false", "BENCH_WAIT_SECS": "0",
              "BENCH_LOCK": str(tmp_path / "lock")})
    assert r.returncode == 1
    rec = _last_json_line(r.stdout)
    assert "error" in rec and "unavailable" in rec["error"].lower()
    assert rec["metric"] == "dir_eval_images_per_sec"


def test_backend_up_skips_wait(tmp_path):
    # Probe passes immediately; eval+train skipped so no device work.
    r = _run({"BENCH_PROBE_CMD": "true", "BENCH_EVAL": "0",
              "BENCH_TRAIN": "0", "BENCH_WAIT_SECS": "0",
              "BENCH_LOCK": str(tmp_path / "lock")})
    assert r.returncode == 0, r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert "error" not in rec
    assert rec["value"] == 0.0  # BENCH_EVAL=0 sentinel


def test_held_lock_times_out_with_json(tmp_path):
    lock_path = tmp_path / "lock"
    holder = open(lock_path, "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    try:
        r = _run({"BENCH_PROBE_CMD": "true", "BENCH_LOCK": str(lock_path),
                  "BENCH_LOCK_WAIT_SECS": "0", "BENCH_WAIT_SECS": "0"})
    finally:
        holder.close()
    assert r.returncode == 1
    rec = _last_json_line(r.stdout)
    assert "error" in rec and "lock" in rec["error"]


def test_outage_then_recovery_retries(tmp_path):
    # Probe fails until a marker file exists; the first probe attempt
    # creates it — so attempt 1 fails, attempt 2 (after the retry
    # sleep is capped at the remaining wait) succeeds.
    marker = tmp_path / "up"
    cmd = f"test -e {marker} || {{ touch {marker}; exit 1; }}"
    r = _run({"BENCH_PROBE_CMD": cmd, "BENCH_WAIT_SECS": "5",
              "BENCH_EVAL": "0", "BENCH_TRAIN": "0",
              "BENCH_LOCK": str(tmp_path / "lock")})
    assert r.returncode == 0, r.stdout + r.stderr[-2000:]
    rec = _last_json_line(r.stdout)
    assert "error" not in rec


def test_bench_platform_cpu_is_tunnel_free(tmp_path):
    """BENCH_PLATFORM=cpu (off-tunnel validation) must not gate on the
    tunneled TPU: the probe subprocess forces the same platform, so the
    run succeeds with zero wait even when the tunnel is down or busy
    (BENCH_WAIT_SECS=0 allows exactly one probe attempt)."""
    r = _run({"BENCH_PLATFORM": "cpu", "BENCH_EVAL": "0",
              "BENCH_TRAIN": "0", "BENCH_INT8": "0",
              "BENCH_WAIT_SECS": "0",
              "BENCH_LOCK": str(tmp_path / "lock")}, timeout=300)
    assert r.returncode == 0, r.stdout + r.stderr
    rec = _last_json_line(r.stdout)
    assert "error" not in rec
