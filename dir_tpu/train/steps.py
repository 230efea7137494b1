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


def decode_wire8(batch: dict) -> dict:
    """Decode the lossless uint8 wire format on device (dtype-driven).

    The host pipeline is uint8 END-TO-END until its final normalize
    (cv2 warp, motion blur, and add_noise all emit uint8 —
    data/augment.py:128 clips+casts; reference utils/utils.py:445-452
    does the same): shipping the pre-normalize uint8 arrays and
    normalizing on device is therefore EXACT, while cutting the
    host->device bytes of a b64 batch 120 MB -> 32 MB (img/dense
    f32->u8, seg i32->u8; measured tunnel-bound at 8.4 img/s loader-fed
    without it, tools/bench_train_pipeline.py). The formulas replicate
    data/native.py:normalize_bgr and InterHandDataset.__getitem__
    (interhand.py:151-158) op-for-op in fp32.

    No-op on float batches, so every step accepts both formats without
    reconfiguration (the dtype is static under jit).
    """
    from dir_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
    b = dict(batch)
    if b["img"].dtype == jnp.uint8:
        rgb = b["img"][..., ::-1].astype(jnp.float32) / 255.0
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        b["img"] = (rgb - mean) / std
    if "dense" in b and b["dense"].dtype == jnp.uint8:
        b["dense"] = b["dense"].astype(jnp.float32) / 255.0
    if "seg" in b and b["seg"].dtype == jnp.uint8:
        b["seg"] = b["seg"].astype(jnp.int32)
    return b


def make_train_step(model, tx, cfg: ModelConfig, mano_left: ManoModel,
                    mano_right: ManoModel, mesh: Mesh | None = None,
                    donate: bool = True, unroll: int = 1,
                    grad_accum: int = 1,
                    compiler_options: dict | None = None) -> Callable:
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

    grad_accum > 1: batch leaves carry a leading ``grad_accum`` axis of
    MICRO-batches; gradients are f32-accumulated over a ``lax.scan`` and
    averaged into ONE optimizer step. New capability over the reference
    (which can only shrink its batch 64 when memory-bound,
    config.py:25): trains the parity configuration's effective batch on
    devices that cannot hold it. BN batch statistics follow per-micro
    -batch semantics — each micro forward normalizes with its own batch
    stats and chains the running stats, exactly what the reference
    would compute stepping smaller batches — and the returned loss_dict
    is the micro-mean (= the full-batch loss for the mean-reduced
    reference terms). Mutually exclusive with ``unroll``.
    """
    if unroll > 1 and grad_accum > 1:
        raise ValueError("unroll and grad_accum are mutually exclusive")

    def loss_for(params, stats, batch):
        batch = decode_wire8(batch)
        out, updates = model.apply(
            {"params": params, "batch_stats": stats},
            batch["img"], mano_left, mano_right, train=True,
            mutable=["batch_stats"])
        loss_dict = dir_losses(out, batch, cfg, mano_left.faces,
                               mano_right.faces, fused_stages=True)
        return total_loss(loss_dict), (updates["batch_stats"], loss_dict)

    def one_step(state: TrainState, batch: dict):
        grad_fn = jax.value_and_grad(loss_for, has_aux=True)
        (_, (new_stats, loss_dict)), grads = grad_fn(
            state.params, state.batch_stats, batch)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, loss_dict

    def accum_step(state: TrainState, batches: dict):
        def micro(carry, batch):
            stats, gsum = carry
            grads, (new_stats, loss_dict) = jax.grad(
                loss_for, has_aux=True)(state.params, stats, batch)
            gsum = jax.tree.map(jnp.add, gsum, grads)
            return (new_stats, gsum), loss_dict

        zeros = jax.tree.map(jnp.zeros_like, state.params)
        (new_stats, gsum), losses = jax.lax.scan(
            micro, (state.batch_stats, zeros), batches)
        grads = jax.tree.map(lambda g: g / grad_accum, gsum)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, jax.tree.map(lambda x: x.mean(0), losses)

    if grad_accum > 1:
        step = accum_step
    elif unroll == 1:
        step = one_step
    else:
        def step(state: TrainState, batches: dict):
            state, losses = jax.lax.scan(one_step, state, batches)
            return state, jax.tree.map(lambda x: x[-1], losses)

    # compiler_options ride the (possibly remote) compile request and
    # are parsed by the BACKEND's compiler — the only way to reach
    # XLA:TPU knobs through the tunneled client, whose local jaxlib
    # aborts on unknown --xla_tpu_* names in XLA_FLAGS
    # (tools/xla_flag_sweep.py).
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else (),
                       compiler_options=compiler_options)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    if unroll > 1 or grad_accum > 1:
        # leading axis is the step / micro-batch index; the per-step
        # batch axis (second) is the sharded one
        data = NamedSharding(mesh, P(None, "data"))
    return jax.jit(
        step,
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
        compiler_options=compiler_options,
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
