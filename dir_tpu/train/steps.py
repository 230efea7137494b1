"""Jitted, mesh-sharded train / eval steps.

The whole step (forward, ~54-term loss, backward, AdamW update, BN stat
update) is one XLA program. Under a data mesh the batch arrives sharded
over ``data`` while state is replicated; XLA inserts the gradient
all-reduce over ICI — this is the TPU-native replacement for the
reference's single-GPU ``backward(); optimizer.step()`` loop
(train.py:66-70).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dir_tpu.config import ModelConfig
from dir_tpu.mano.assets import ManoModel
from dir_tpu.models.losses import dir_losses, total_loss
from dir_tpu.parallel.mesh import batch_sharding, replicated_sharding
from dir_tpu.train.state import TrainState


def make_train_step(model, tx, cfg: ModelConfig, mano_left: ManoModel,
                    mano_right: ManoModel, mesh: Mesh | None = None,
                    donate: bool = True, unroll: int = 1) -> Callable:
    """Build the jitted train step: (state, batch) -> (state, loss_dict).

    batch: {"img": (B, H, W, 3)} plus every target key consumed by
    :func:`dir_losses`.

    unroll > 1: batch leaves carry a leading ``unroll`` axis (stacked
    consecutive batches) and the program runs that many optimizer steps
    in ONE ``lax.scan`` — amortizing the per-dispatch host/RPC overhead
    (≈8 ms/step through this box's device tunnel) without changing the
    math: step k consumes batch k exactly as the unrolled=1 loop would
    (equivalence test: tests/test_train_e2e.py::test_unrolled_steps).
    Returns the LAST step's loss_dict (what a per-N-iteration logger
    reads).
    """

    def one_step(state: TrainState, batch: dict):
        def loss_fn(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["img"], mano_left, mano_right, train=True,
                mutable=["batch_stats"])
            loss_dict = dir_losses(out, batch, cfg, mano_left.faces,
                                   mano_right.faces, fused_stages=True)
            return total_loss(loss_dict), (updates["batch_stats"], loss_dict)

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (new_stats, loss_dict)), grads = grad_fn(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, loss_dict

    if unroll == 1:
        step = one_step
    else:
        def step(state: TrainState, batches: dict):
            state, losses = jax.lax.scan(one_step, state, batches)
            return state, jax.tree.map(lambda x: x[-1], losses)

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    if unroll > 1:
        # leading axis is the step index; the per-step batch axis
        # (second) is the sharded one
        data = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mano_left: ManoModel, mano_right: ManoModel,
                   mesh: Mesh | None = None) -> Callable:
    """Build the jitted inference step: (variables, img) -> outputs."""

    def step(variables, img):
        return model.apply(variables, img, mano_left, mano_right,
                           train=False)

    if mesh is None:
        return jax.jit(step)
    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(step, in_shardings=(repl, data), out_shardings=data)
