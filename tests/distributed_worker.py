"""Worker process for the multi-process jax.distributed test.

Usage: python tests/distributed_worker.py PROC_ID NUM_PROCS PORT DEVS

Initializes `jax.distributed` against a localhost coordinator, builds
the GLOBAL data mesh over NUM_PROCS x DEVS virtual CPU devices, and runs
the same deterministic sharded train step as the driver's multichip dry
run (`__graft_entry__.sharded_step_loss`). Prints one machine-readable
line: ``WORKER_LOSS <proc_id> <loss>``.

The coordinator (process 0) and all workers must see the identical
model/batch, so any loss disagreement across topologies exposes a
sharding or collective bug.
"""

import os
import sys

proc_id, num_procs, port, devs = (int(sys.argv[1]), int(sys.argv[2]),
                                  sys.argv[3], int(sys.argv[4]))

# Per-process virtual CPU devices + the 1-core-host collective timeouts
# (see __graft_entry__). Must be set before the first backend init.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={devs}"
    " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    " --xla_cpu_collective_timeout_seconds=1200").strip()

import jax  # noqa: E402

# sitecustomize registers the tunneled TPU backend and overrides
# JAX_PLATFORMS — force CPU through the config (cf. tests/conftest.py).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402  (enables the compile cache)
from dir_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402

jax.config.update("jax_disable_most_optimizations", True)

if num_procs > 1:
    init_distributed(f"127.0.0.1:{port}", num_procs, proc_id)
n_global = num_procs * devs
assert len(jax.devices()) == n_global, (
    f"expected {n_global} global devices, got {len(jax.devices())}")
assert jax.process_count() == num_procs

mesh = make_mesh(n_global)
loss = ge.sharded_step_loss(mesh, n_global)
print(f"WORKER_LOSS {proc_id} {loss:.6f}", flush=True)
