"""Device mesh and sharding utilities (the TPU-native "distributed backend").

The reference is single-GPU (SURVEY §2.5): it has no distributed code at
all. Here data parallelism is expressed the JAX way: a 1-D ``Mesh`` over
the ``data`` axis, batches sharded across it, parameters replicated, and
XLA emitting the gradient all-reduce over ICI. No hand-written
collectives are needed — the mesh + shardings ARE the backend.
"""

from dir_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicated_sharding",
           "shard_batch"]
