"""Mesh-size-agnostic partitioning (VERDICT r4 #7).

The driver validates the multichip path at 8 virtual devices; these
tests re-run the SAME dryrun (both program classes: sharded train step
AND sharded eval+metrics, __graft_entry__.dryrun_multichip) at 16 and
32 virtual CPU devices to certify nothing hard-codes the mesh size —
batch sizing, shardings, and collective layouts must all scale with
``n_devices``.
"""

import os
import subprocess
import sys

import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("n", [16, 32])
def test_dryrun_scales_past_eight(n):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n}"
        # 1-core host: n timesliced replicas overrun XLA:CPU's default
        # 40 s collective rendezvous (same raise as __graft_entry__)
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        " --xla_cpu_collective_timeout_seconds=1200")
    env["JAX_PLATFORMS"] = "cpu"
    env["DRYRUN_DEVICES"] = str(n)
    p = subprocess.run(
        [sys.executable, os.path.join(_REPO, "__graft_entry__.py")],
        capture_output=True, text=True, cwd=_REPO, env=env, timeout=2400)
    out = p.stdout + p.stderr
    assert p.returncode == 0, f"dryrun({n}) failed:\n{out[-4000:]}"
    assert f"train step executed on {n} devices" in out, out[-2000:]
