"""Multi-process `jax.distributed` correctness (SURVEY §2.5 comm-backend
deliverable — the reference has no distributed code at all).

Spawns two coordinator+worker processes, each with 4 virtual CPU
devices, that run `init_distributed` + one sharded train step over the
8-device GLOBAL mesh, and asserts the loss equals the single-process
8-device run of the identical step — proving `parallel/mesh.py`'s
distributed init, the cross-process `shard_batch` path, and the XLA
collectives compose correctly across process topologies. (The step is
a compact MLP, not full DIR: gloo hard-codes a 30 s communicator-init
timeout that the 1-core host's timesliced full-model replicas overrun —
see tests/distributed_worker.py; full-DIR sharding is covered by the
single-process dryrun + DP-equivalence tests.)
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WORKER = os.path.join(_REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(proc_id, num_procs, port, devs, mode="train"):
    env = dict(os.environ)
    # The parent pytest process pins 8 CPU devices via XLA_FLAGS; the
    # worker must choose its own device count.
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.Popen(
        [sys.executable, _WORKER, str(proc_id), str(num_procs), str(port),
         str(devs), mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=_REPO, env=env)


def _loss_from(out: str, proc_id: int) -> float:
    m = re.search(rf"WORKER_LOSS {proc_id} ([0-9.]+)", out)
    assert m, f"worker {proc_id} printed no loss:\n{out[-3000:]}"
    return float(m.group(1))


@pytest.mark.slow
def test_two_process_step_matches_single_process():
    port = _free_port()
    # 2 processes x 4 devices: both compile + execute one fwd+bwd+AdamW
    # step of the tiny flagship over the global 8-device mesh.
    procs = [_spawn(i, 2, port, 4) for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    loss_multi = [_loss_from(o, i) for i, o in enumerate(outs)]
    # Every process computes the same global loss (it is all-reduced).
    assert loss_multi[0] == loss_multi[1]

    # Single-process 8-device reference run of the identical step.
    p = _spawn(0, 1, port, 8)
    out, _ = p.communicate(timeout=1500)
    assert p.returncode == 0, f"single-process run failed:\n{out[-3000:]}"
    loss_single = _loss_from(out, 0)

    # Same model, params, batch; only the process topology differs. The
    # cross-process all-reduce may re-associate fp32 sums.
    np.testing.assert_allclose(loss_multi[0], loss_single, rtol=1e-4)


@pytest.mark.slow
def test_two_process_eval_metric_matches_single_process():
    """The EVAL+metric program class (VERDICT r4 #6): sharded per-sample
    predictions through the production evaluate.batch_metrics reduction
    over a 2-process mesh == the single-process 8-device run. Mirrors
    the train-step test so multi-host coverage matches the
    single-process dryrun's two program classes."""
    port = _free_port()
    procs = [_spawn(i, 2, port, 4, mode="eval") for i in range(2)]
    outs = []
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
    metric_multi = [_loss_from(o, i) for i, o in enumerate(outs)]
    assert metric_multi[0] == metric_multi[1]  # replicated output

    p = _spawn(0, 1, port, 8, mode="eval")
    out, _ = p.communicate(timeout=1500)
    assert p.returncode == 0, f"single-process run failed:\n{out[-3000:]}"
    metric_single = _loss_from(out, 0)
    np.testing.assert_allclose(metric_multi[0], metric_single, rtol=1e-4)
