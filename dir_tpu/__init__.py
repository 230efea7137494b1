"""dir_tpu — a TPU-native two-hand reconstruction framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of DIR
("Decoupled Iterative Refinement Framework for Interacting Hands
Reconstruction from a Single RGB Image", ICCV 2023): a differentiable
MANO body-model runtime, the DIR network family (ResNet backbone,
decoupled joint-space/image-space iterative refinement), losses, the
InterHand2.6M data pipeline, a sharded trainer, and an eval harness —
all designed TPU-first (static shapes, fused XLA compute, data
parallelism over a `jax.sharding.Mesh`).

Layout:
    dir_tpu.ops       — pure geometry / sampling / splatting ops (jnp + Pallas)
    dir_tpu.mano      — MANO assets + functional differentiable MANO layer
    dir_tpu.models    — flax.linen network components + the DIR model + losses
    dir_tpu.data      — InterHand2.6M pipeline, augmentation, synthetic data
    dir_tpu.parallel  — device mesh / sharding helpers
    dir_tpu.train     — train/eval steps, trainer, checkpointing
    dir_tpu.serve     — AOT export / serving artifacts (jax.export)
    dir_tpu.utils     — logging, misc
"""

__version__ = "0.1.0"

from dir_tpu.config import (Config, DataConfig, ModelConfig,  # noqa: E402
                            TrainConfig, load_yaml, save_yaml)

__all__ = ["Config", "DataConfig", "ModelConfig", "TrainConfig",
           "load_yaml", "save_yaml", "__version__"]
