"""Int8 post-training quantization for inference convolutions.

TPU v5e's MXU runs s8 x s8 -> s32 at twice the bf16 rate (~394 TOPS vs
~197 TFLOP/s), and int8 activations halve the HBM bytes of every conv
operand. This module provides the serving-side quantized execution of
the backbone's convolutions (the reference has no quantized path at
all — it serves fp32 CUDA, apps/eval.py:104-108; this is a TPU-native
serving capability on top of parity).

Scheme (standard PTQ, chosen so NO calibration pass is needed):
  - weights: symmetric per-output-channel int8; scale = max|W_o| / 127
    over (kh, kw, I). BN is folded into the conv first (exact fp32
    algebra, ops/pallas_bottleneck.py:fold_bn), so the quantization
    grid covers the scaled kernel the conv actually applies.
  - activations: symmetric per-tensor DYNAMIC int8 — scale computed
    from the live batch max. One extra reduction + cast per conv
    input; the conv itself then reads half the bytes and runs at the
    int8 MXU rate, which dominates at the compute-bound shapes
    (layer3+/decoder; DESIGN.md §7).
  - accumulation in int32 (preferred_element_type), dequantized with
    act_scale * w_scale[o] in fp32, bias added post-dequant.

Two activation-scale modes:
  - DYNAMIC (default): scale from the live batch |max|. Zero setup,
    saturation-free, but each conv input pays a full reduction that
    must complete before the quantize pass (two passes over the
    activation).
  - STATIC (``quant_static``): scales read from a "quant_stats"
    variable collection filled by a calibration pass — run the model
    once (or N times; maxes accumulate monotonically) with
    ``mutable=["quant_stats"]`` and merge the updates into the
    variables. The quantize then needs no reduction, so XLA can fuse
    it into the producer's epilogue; inputs beyond the calibrated
    range saturate at +/-127 (standard PTQ behavior).

Numerics: exact when weights and activations are already representable
on the int8 grid (tests/test_quant.py grid test); on random data the
per-conv relative error is the usual ~1e-2 PTQ regime — a serving
OPTION behind a flag, never the parity default.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def quantize_weight_per_channel(w: jnp.ndarray) -> Tuple[jnp.ndarray,
                                                         jnp.ndarray]:
    """(kh, kw, I, O) fp kernel -> (int8 kernel, fp32 scale[O]).

    Symmetric, per-output-channel: scale_o = max|W[..., o]| / 127,
    zero-point 0. Channels that are exactly zero get scale 1 to avoid
    0/0 (their quantized weights are all zero anyway)."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1)))
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def scale_from_amax(amax: jnp.ndarray) -> jnp.ndarray:
    """Symmetric per-tensor scale; 1.0 for an all-zero tensor."""
    return jnp.where(amax > 0, amax / 127.0, 1.0)


def quantize_act(x: jnp.ndarray,
                 scale: jnp.ndarray) -> jnp.ndarray:
    """fp activations -> int8 on the given symmetric per-tensor scale
    (values beyond 127*scale saturate)."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale),
                    -127, 127).astype(jnp.int8)


def quantize_act_dynamic(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """fp activations -> (int8, fp32 scalar scale), symmetric per-tensor
    with the scale from the live |max| (dynamic quantization)."""
    scale = scale_from_amax(jnp.max(jnp.abs(x.astype(jnp.float32))))
    return quantize_act(x, scale), scale


def module_act_scale(mod, name: str, x: jnp.ndarray,
                     static: bool) -> jnp.ndarray:
    """Activation scale for a conv input inside a flax module.

    Three behaviors:
      - dynamic (static=False, not calibrating): live |max|; no
        variable is touched, so the default path needs no collection.
      - calibrating (the "quant_stats" collection is mutable in this
        apply): a scalar amax variable named ``name`` accumulates the
        running max across calibration calls; the live scale is used
        for this call's outputs.
      - static serving (static=True): the stored amax is read —
        variables must carry the "quant_stats" collection produced by
        calibration (flax raises on a missing collection otherwise).
    """
    calibrating = mod.is_mutable_collection("quant_stats")
    live = None
    if not static or calibrating:
        live = jnp.max(jnp.abs(x.astype(jnp.float32)))
    if static or calibrating:
        var = mod.variable("quant_stats", name,
                           lambda: jnp.zeros((), jnp.float32))
        if calibrating:
            var.value = jnp.maximum(var.value, live)
        else:
            live = var.value
    return scale_from_amax(live)


def merge_calibration(variables: dict, updates: dict) -> dict:
    """Fold a ``mutable=["quant_stats"]`` apply's updates into the
    variable dict for static-scale serving."""
    return {**variables, "quant_stats": updates["quant_stats"]}


def calibrate_static_scales(model, variables: dict, img, mano_l,
                            mano_r) -> dict:
    """One calibration pass: run the model with the "quant_stats"
    collection mutable so every ``module_act_scale`` records its
    activation amax, and fold the result back into ``variables`` for
    static-scale serving. The shared helper behind bench.py,
    apps/eval.py --quant_static, and tools/profile_eval.py — amaxes
    accumulate monotonically, so calling it again on further batches
    only tightens the tails."""
    import jax as _jax

    calib = _jax.jit(lambda v, im: model.apply(
        v, im, mano_l, mano_r, train=False, mutable=["quant_stats"])[1])
    return merge_calibration(
        variables, _jax.device_get(calib(variables, img)))


def module_quant_conv(mod, name: str, x: jnp.ndarray,
                      stride: Tuple[int, int] = (1, 1), padding="SAME",
                      static: bool = False, out_dtype=None,
                      fold_bn_name: Optional[str] = None,
                      bn_eps: float = 1e-5) -> jnp.ndarray:
    """Int8 execution of an existing ``nn.Conv`` submodule's parameters.

    The flax-module-side twin of ``quant_conv`` for the auxiliary convs
    outside the backbone/decoder blocks (AttentionPool, fusion/head
    convs, the stem): reads the submodule's kernel/bias from the parent
    scope (the fp path created them; identical parameter tree), records
    or reads the activation amax via ``module_act_scale`` under
    ``"{name}_in"``, and optionally folds a FOLLOWING inference
    BatchNorm (``fold_bn_name``) into the kernel first — exact fp32
    algebra as ops/pallas_bottleneck.py:fold_bn, extended to convs that
    carry their own bias: BN(conv(x, W) + b0) == conv(x, W*g) +
    (beta + (b0 - mean) * g), g = scale/sqrt(var + eps)."""
    pr = mod.get_variable("params", name)
    w = pr["kernel"].astype(jnp.float32)
    b = pr.get("bias")
    b = None if b is None else b.astype(jnp.float32)
    if fold_bn_name is not None:
        bnp = mod.get_variable("params", fold_bn_name)
        bns = mod.get_variable("batch_stats", fold_bn_name)
        g = (bnp["scale"].astype(jnp.float32)
             * jax.lax.rsqrt(bns["var"].astype(jnp.float32) + bn_eps))
        w = w * g
        b0 = jnp.zeros_like(g) if b is None else b
        b = (bnp["bias"].astype(jnp.float32)
             + (b0 - bns["mean"].astype(jnp.float32)) * g)
    sc = module_act_scale(mod, f"{name}_in", x, static)
    return quant_conv(x, w, stride, padding, bias=b,
                      out_dtype=out_dtype if out_dtype is not None
                      else x.dtype, act_scale=sc)


def conv_int8(x_q: jnp.ndarray, w_q: jnp.ndarray,
              x_scale: jnp.ndarray, w_scale: jnp.ndarray,
              stride: Tuple[int, int] = (1, 1),
              padding="SAME",
              bias: Optional[jnp.ndarray] = None,
              out_dtype=jnp.float32) -> jnp.ndarray:
    """s8 x s8 -> s32 NHWC conv, dequantized to ``out_dtype``.

    x_q: (B, H, W, I) int8; w_q: (kh, kw, I, O) int8. The int32
    accumulator is exact (max |sum| = kh*kw*I*127^2 < 2^31 for every
    shape in this model), so the only quantization error is the input
    rounding."""
    dn = jax.lax.conv_dimension_numbers(x_q.shape, w_q.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    acc = jax.lax.conv_general_dilated(
        x_q, w_q, stride, padding, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * (x_scale * w_scale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def quant_conv(x: jnp.ndarray, w: jnp.ndarray,
               stride: Tuple[int, int] = (1, 1), padding="SAME",
               bias: Optional[jnp.ndarray] = None,
               out_dtype=None,
               act_scale: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Quantize-then-convolve: the drop-in int8 replacement for an
    inference ``conv(x, w) + bias``. ``act_scale``: a precomputed
    (static/calibrated) activation scale; None = dynamic live |max|."""
    if out_dtype is None:
        out_dtype = x.dtype
    if act_scale is None:
        x_q, x_s = quantize_act_dynamic(x)
    else:
        x_q, x_s = quantize_act(x, act_scale), act_scale
    w_q, w_s = quantize_weight_per_channel(w)
    return conv_int8(x_q, w_q, x_s, w_s, stride, padding, bias, out_dtype)
