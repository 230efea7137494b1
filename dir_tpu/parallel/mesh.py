"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX (one controller per host).

    On Cloud TPU pods the arguments are auto-detected from the
    environment; pass them explicitly elsewhere. After this,
    jax.devices() spans the whole pod and :func:`make_mesh` builds the
    global data mesh — the same train step then shards over every chip
    with ICI all-reduce inside hosts and DCN between them. No other
    code changes are needed (single-controller SPMD).
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` local devices.

    On a v5e-8 this is the full pod slice with gradient all-reduce riding
    ICI; under ``xla_force_host_platform_device_count=N`` it is the
    virtual CPU mesh used by tests and the multichip dry run.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, leading_steps: bool = False):
    """Place a pytree of host arrays onto the mesh, batch-axis sharded.

    leading_steps: the leaves carry a leading scan/step axis (stacked
    multi-step batches, train/steps.py unroll) — the SECOND axis is the
    sharded batch axis.

    Single-process: a plain sharded device_put. Multi-process (after
    :func:`init_distributed`): every process passes the same GLOBAL
    batch and contributes only its addressable shards via
    ``make_array_from_callback`` — device_put cannot target another
    process's devices. Covered by tests/test_distributed.py (2-process
    CPU mesh)."""
    if leading_steps:
        sharding = NamedSharding(mesh, P(None, "data"))
    else:
        sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(
                x.shape, sharding, lambda idx: x[idx])
        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
