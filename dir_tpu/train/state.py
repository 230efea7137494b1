"""Train state and optimizer construction.

Optimizer matches the reference trainer (train.py:227-232): AdamW at
lr 5e-4 with either cosine annealing to 0 over the total epochs or a
step schedule — both stepped per *epoch* as torch schedulers are, which
we express as a per-step schedule quantized to epoch boundaries.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax

from dir_tpu.config import TrainConfig


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """Per-epoch-quantized schedule matching torch semantics."""
    if cfg.lr_scheduler == "cosine":

        def sched(step):
            epoch = step // steps_per_epoch
            frac = jnp.minimum(epoch / cfg.total_epochs, 1.0)
            return cfg.lr * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

        return sched
    if cfg.lr_scheduler == "step":
        milestones = jnp.asarray(cfg.step_milestones)

        def sched(step):
            epoch = step // steps_per_epoch
            n_passed = jnp.sum(epoch >= milestones)
            return cfg.lr * cfg.step_gamma ** n_passed

        return sched
    raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    return optax.adamw(lr_schedule(cfg, steps_per_epoch),
                       weight_decay=cfg.weight_decay)


def create_train_state(variables: dict, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
    )
