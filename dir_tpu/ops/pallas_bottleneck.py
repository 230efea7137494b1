"""Fused ResNet bottleneck INFERENCE kernel (Pallas TPU).

Eval profiling (tools/profile_eval.py) shows the early backbone stages
are HBM-bound under XLA: every conv in a bottleneck block round-trips
its (B, 64, 64, C) intermediate through HBM (layer1's three 1x1
expansions alone: 5.9 ms at 44 TF/s for batch 256 — reads/writes of
537 MB activations dominate). This kernel computes a whole bottleneck
block — conv1x1 -> BN -> ReLU -> conv3x3 -> BN -> ReLU -> conv1x1 -> BN
-> (+ residual) -> ReLU, reference models/backbone/resnet.py:59-82 —
for one sample per grid step entirely in VMEM: HBM traffic drops to the
block input + output only.

Inference-only by design: BatchNorm running statistics fold into the
conv weights (exact affine fold, done in fp32 at trace time), and
training keeps the XLA path (the backward needs the intermediates this
kernel deliberately never materializes). Stride-1 identity blocks and
the stride-1 projection block (layer1_0) are supported; stride-2 blocks
stay on XLA (they are compute-bound there, not bandwidth-bound).

The 3x3 conv runs as ONE K=9M matmul over a shifted-window concat built
in VMEM — M=64 channel blocks would otherwise waste 3/4 of the MXU.

Negative results from this kernel's tuning (kept so they aren't re-run):
  * 32x32x512 (layer2) blocks: Mosaic compile does not terminate
    (>10 min) for the whole-map kernel at that shape. RESOLVED by the
    row-banded schedule (``bands=4`` -> ``_kernel_banded``): conv2's
    shifted-window concat, conv3 and the residual run per row band, so
    the full-size (HW, 9*mid) concat never exists — compiles in
    seconds and measures 2.57 vs 3.71 ms/block XLA at b256 bf16.
    IN-MODEL it still loses (eval 5,992 vs 6,159 img/s with the same
    build): the kernel boundaries forbid XLA's cross-block fusions
    around layer2, costing more than the per-block win — layer2 stays
    on XLA by default (models/resnet.py FUSED_L2_BANDS).
  * A 64-channel kernel boundary forces XLA into a 268 MB relayout
    copy + an unfused reduce-window upstream (half-empty 128-lane
    default layout), which is why blocks with <128 input channels
    (layer1_0) stay on XLA — see the guard in models/resnet.py
    Bottleneck.__call__.
  * ``fused_stem_bottleneck`` below (bn1 + relu + maxpool + layer1_0
    off the raw stem-conv output, paired-W lane-full layout, banded
    VMEM scheduling) is a WORKING, tested kernel — but an exploration,
    NOT wired into the model: it measures 7.0 ms at batch 256 vs
    ~5.3 ms for the same segment inside the XLA model (the pool's
    half-lane slices relayout in VMEM, and the in-model version would
    additionally pay the 64-channel boundary copy above). Kept as the
    reference for banded VMEM scheduling + the paired-W maxpool
    formulation; delete if a future Mosaic handles half-lane slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def cost_if_static(flops, bytes_accessed, transcendentals=0):
    """CostEstimate, or None when any term is a symbolic dimension.

    Under shape-polymorphic jax.export (serve.py exports with a symbolic
    batch dim ``b``) the batch size is a _DimExpr and
    pl.CostEstimate requires ints — skip the estimate there; it only
    tunes the XLA scheduler, never correctness.
    """
    if not (isinstance(flops, int) and isinstance(bytes_accessed, int)):
        return None
    return pl.CostEstimate(flops=flops, bytes_accessed=bytes_accessed,
                           transcendentals=transcendentals)


def fold_bn(kernel: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
            mean: jnp.ndarray, var: jnp.ndarray, eps: float = 1e-5):
    """Fold an inference BatchNorm into the preceding conv (fp32, exact):
    BN(conv(x, W)) == conv(x, W * g) + (b - m * g), g = scale/sqrt(var+eps).
    kernel: (..., O); returns (folded_kernel, folded_bias) in fp32."""
    g = (scale / jnp.sqrt(var + eps)).astype(jnp.float32)
    w = kernel.astype(jnp.float32) * g
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * g
    return w, b


def _bottleneck_body(xf, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     wd_ref, bd_ref, *, h: int, w: int, mid: int,
                     has_down: bool):
    """Shared VMEM bottleneck math. xf: (H*W, C) activations."""
    f32 = jnp.float32
    hw = h * w

    # conv1 1x1 + bn1 + relu
    y1 = jnp.dot(xf, w1_ref[...], preferred_element_type=f32)
    y1 = jnp.maximum(y1 + b1_ref[...], 0.0).astype(xf.dtype)

    # conv2 3x3 (padding 1) + bn2 + relu: shifted windows concatenated
    # channel-wise -> one K=9*mid matmul on the MXU
    y1p = jnp.pad(y1.reshape(h, w, mid), ((1, 1), (1, 1), (0, 0)))
    cols = [y1p[dy:dy + h, dx:dx + w].reshape(hw, mid)
            for dy in range(3) for dx in range(3)]
    ycat = jnp.concatenate(cols, axis=-1)          # (HW, 9*mid)
    y2 = jnp.dot(ycat, w2_ref[...], preferred_element_type=f32)
    y2 = jnp.maximum(y2 + b2_ref[...], 0.0).astype(xf.dtype)

    # conv3 1x1 + bn3, residual (optionally projected), relu. The add
    # runs in the activation dtype — matching the XLA trunk (conv3/bn3
    # emit bf16 there too) and halving the VMEM of the two (HW, O)
    # temporaries (the fp32 version OOMs the 16 MB VMEM stack).
    y3 = (jnp.dot(y2, w3_ref[...], preferred_element_type=f32)
          + b3_ref[...]).astype(xf.dtype)
    if has_down:
        res = (jnp.dot(xf, wd_ref[...], preferred_element_type=f32)
               + bd_ref[...]).astype(xf.dtype)
    else:
        res = xf
    return jnp.maximum(y3 + res, 0.0)


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
            wd_ref, bd_ref, out_ref, *, h: int, w: int, mid: int,
            has_down: bool):
    x = x_ref[0]                                   # (H, W, C) bf16
    xf = x.reshape(h * w, x.shape[-1])
    out = _bottleneck_body(xf, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
                           b3_ref, wd_ref, bd_ref, h=h, w=w, mid=mid,
                           has_down=has_down)
    out_ref[0] = out.astype(out_ref.dtype).reshape(h, w, -1)


def _kernel_banded(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                   wd_ref, bd_ref, out_ref, *, h: int, w: int, mid: int,
                   has_down: bool, n_bands: int):
    """Row-banded variant: conv1 runs whole, then conv2's shifted-window
    concat, conv3 and the residual are computed per row band and written
    out band-by-band — the full-size (HW, 9*mid) concat and (HW, O)
    tails never exist. This is the scheduling that lets Mosaic compile
    the layer2 (32x32x512, mid 128) shape, where the full-size _kernel
    graph does not terminate (header note)."""
    x = x_ref[0]                                   # (H, W, C) bf16
    c = x.shape[-1]
    xf = x.reshape(h * w, c)
    f32 = jnp.float32

    y1 = jnp.dot(xf, w1_ref[...], preferred_element_type=f32)
    y1 = jnp.maximum(y1 + b1_ref[...], 0.0).astype(x.dtype)
    y1p = jnp.pad(y1.reshape(h, w, mid), ((1, 1), (1, 1), (0, 0)))

    bh = h // n_bands
    for j in range(n_bands):
        seg = y1p[bh * j:bh * j + bh + 2]          # (bh+2, W+2, mid)
        cols = [seg[dy:dy + bh, dx:dx + w].reshape(bh * w, mid)
                for dy in range(3) for dx in range(3)]
        ycat = jnp.concatenate(cols, axis=-1)      # (bh*W, 9*mid)
        y2 = jnp.dot(ycat, w2_ref[...], preferred_element_type=f32)
        y2 = jnp.maximum(y2 + b2_ref[...], 0.0).astype(x.dtype)
        y3 = (jnp.dot(y2, w3_ref[...], preferred_element_type=f32)
              + b3_ref[...]).astype(x.dtype)
        xb = xf[bh * w * j:bh * w * (j + 1)]
        if has_down:
            res = (jnp.dot(xb, wd_ref[...], preferred_element_type=f32)
                   + bd_ref[...]).astype(x.dtype)
        else:
            res = xb
        band = jnp.maximum(y3 + res, 0.0)
        out_ref[0, bh * j:bh * (j + 1)] = band.astype(
            out_ref.dtype).reshape(bh, w, -1)


def _stem_kernel(x_ref, g1_ref, t1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                 w3_ref, b3_ref, wd_ref, bd_ref, out_ref, *, h: int,
                 w: int, c: int, mid: int):
    """BN + ReLU + maxpool(3x3/2, pad 1) + the projection bottleneck
    (layer1_0), one sample per program, input in PAIRED-W layout:
    x_ref block (1, 2H, W, 2C) where [..., :C] is the even W pixel of
    the pair and [..., C:] the odd one (a free contiguous reshape of
    (2H, 2W, C) done in XLA). Every in-kernel op is Mosaic-friendly:
    full 2C=128 lanes (no half-lane padding -> no VMEM blowup), H
    downsample = major-axis reshape-split, W downsample = minor-axis
    slices of the pair dim. Zero padding is exact for the pool
    (post-ReLU values are nonnegative; each window has a real pixel).
    """
    x = x_ref[0]                                   # (2H, W, 2C)
    gg = jnp.concatenate([g1_ref[...], g1_ref[...]]).astype(x.dtype)
    tt = jnp.concatenate([t1_ref[...], t1_ref[...]]).astype(x.dtype)

    # Pool band-by-band (static unroll): the full-resolution
    # affine/relu/rowmax chain would hold ~6 MB of (2H, W, 2C)
    # temporaries live at once and overflow the 16 MB VMEM stack
    # together with the pipeline buffers; per band the working set is
    # ~1 MB. Band edges get static zero padding (exact post-ReLU).
    n_bands = 4
    bh = h // n_bands                               # pooled rows/band
    pooled_bands = []
    for j in range(n_bands):
        r0 = 2 * bh * j                             # first input row
        lo = max(0, r0 - 1)
        hi = min(2 * h, r0 + 2 * bh + 1)
        seg = jnp.maximum(x[lo:hi] * gg + tt, 0.0)  # (rows, W, 2C)
        pad_top = lo - (r0 - 1)
        pad_bot = (r0 + 2 * bh + 1) - hi
        seg = jnp.pad(seg, ((pad_top, pad_bot), (0, 0), (0, 0)))
        rm = jnp.maximum(jnp.maximum(seg[: 2 * bh], seg[1:2 * bh + 1]),
                         seg[2:2 * bh + 2])         # (2*bh, W, 2C)
        r = rm.reshape(bh, 2, w, 2 * c)[:, 0]       # (bh, W, 2C)
        # W window {2j-1, 2j, 2j+1} = odd(j-1), even(j), odd(j). The
        # previous-pair shift pads the FULL 2C tensor and slices after
        # — padding a lane-offset slice is an unsupported layout op in
        # Mosaic ("offset mismatch on non-concat dimension").
        r_shift = jnp.pad(r, ((0, 0), (1, 0), (0, 0)))[:, :w]
        pooled_bands.append(jnp.maximum(
            jnp.maximum(r[:, :, :c], r[:, :, c:]), r_shift[:, :, c:]))
    pooled = jnp.concatenate(pooled_bands, axis=0)  # (H, W, C)

    f32 = jnp.float32
    # conv1 over the whole pooled map (small). The 3x3 runs as K=9*mid
    # windows-concat matmuls over TWO H-halves (M=HW/2) — nine
    # accumulated K=mid matmuls per band measured latency-bound (36
    # sub-1us dispatches), while a single full-size concat overflows
    # VMEM together with the pipeline buffers. conv3 + residual write
    # out_ref band-by-band so the (HW, O) tails never exist whole.
    xf = pooled.reshape(h * w, c)
    y1 = jnp.dot(xf, w1_ref[...], preferred_element_type=f32)
    y1 = jnp.maximum(y1 + b1_ref[...], 0.0).astype(x.dtype)
    y1p = jnp.pad(y1.reshape(h, w, mid), ((1, 1), (1, 1), (0, 0)))
    hh = h // 2
    y2_parts = []
    for j in range(2):
        seg = y1p[hh * j:hh * j + hh + 2]           # (hh+2, W+2, mid)
        cols = [seg[dy:dy + hh, dx:dx + w].reshape(hh * w, mid)
                for dy in range(3) for dx in range(3)]
        ycat = jnp.concatenate(cols, axis=-1)       # (hh*W, 9*mid)
        acc = jnp.dot(ycat, w2_ref[...], preferred_element_type=f32)
        y2_parts.append(jnp.maximum(acc + b2_ref[...], 0.0).astype(
            x.dtype))
    y2 = jnp.concatenate(y2_parts, axis=0)          # (HW, mid)
    for j in range(n_bands):
        y2b = y2[bh * w * j:bh * w * (j + 1)]
        y3 = (jnp.dot(y2b, w3_ref[...], preferred_element_type=f32)
              + b3_ref[...]).astype(x.dtype)
        xb = pooled[bh * j:bh * (j + 1)].reshape(bh * w, c)
        res = (jnp.dot(xb, wd_ref[...], preferred_element_type=f32)
               + bd_ref[...]).astype(x.dtype)
        band = jnp.maximum(y3 + res, 0.0)
        out_ref[0, bh * j:bh * (j + 1)] = band.astype(
            out_ref.dtype).reshape(bh, w, -1)


@functools.partial(jax.jit, static_argnames=("interpret", "bands"))
def fused_bottleneck_infer(x: jnp.ndarray,
                           w1: jnp.ndarray, b1: jnp.ndarray,
                           w2: jnp.ndarray, b2: jnp.ndarray,
                           w3: jnp.ndarray, b3: jnp.ndarray,
                           wd: jnp.ndarray | None = None,
                           bd: jnp.ndarray | None = None,
                           interpret: bool = False,
                           bands: int = 0) -> jnp.ndarray:
    """One fused stride-1 bottleneck block at inference.

    Args:
        x: (B, H, W, C) input (bf16 recommended).
        w1: (C, M) folded conv1 kernel (fp32); b1: (M,).
        w2: (3, 3, M, M) folded conv2 kernel; b2: (M,).
        w3: (M, O) folded conv3 kernel; b3: (O,).
        wd, bd: optional (C, O)/(O,) folded projection for the residual
            (layer1_0's stride-1 downsample); identity residual if None.
        bands: 0 = whole-map kernel; N>1 = row-banded conv2/conv3
            scheduling (_kernel_banded; required for the layer2 shape).
    Returns:
        (B, H, W, O) block output, dtype of x.
    """
    b, h, w, c = x.shape
    mid = w1.shape[-1]
    o = w3.shape[-1]
    has_down = wd is not None
    if not has_down:
        wd = jnp.zeros((c, o), jnp.float32)
        bd = jnp.zeros((o,), jnp.float32)
    dt = x.dtype
    # weights enter the MXU in the input dtype (bf16 trunk); biases and
    # accumulation stay fp32
    w1c = w1.astype(dt)
    w2c = w2.reshape(9 * mid, mid).astype(dt)
    w3c = w3.astype(dt)
    wdc = wd.astype(dt)

    if bands:
        assert h % bands == 0, (h, bands)
        kernel = functools.partial(_kernel_banded, h=h, w=w, mid=mid,
                                   has_down=has_down, n_bands=bands)
    else:
        kernel = functools.partial(_kernel, h=h, w=w, mid=mid,
                                   has_down=has_down)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_333 = 2 * h * w * (c * mid + 9 * mid * mid + mid * o
                             + (c * o if has_down else 0))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((1, h, w, o), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), dt),
        cost_estimate=cost_if_static(
            flops=b * flops_333,
            bytes_accessed=b * h * w * (c + o) * x.dtype.itemsize,
        ),
        interpret=interpret,
    )(x, w1c, b1.astype(jnp.float32), w2c, b2.astype(jnp.float32),
      w3c, b3.astype(jnp.float32), wdc, bd.astype(jnp.float32))


def _quant_kernel(inv_ref, x_ref, w1_ref, m1_ref, b1_ref, w2_ref, m2_ref,
                  b2_ref, w3_ref, m3_ref, b3_ref, wd_ref, md_ref, bd_ref,
                  out_ref, *, h: int, w: int, mid: int, has_down: bool,
                  n_bands: int):
    """Whole-bottleneck INT8 inference: quantize -> s8 matmul -> dequant
    -> relu -> requantize, three convs + residual, per sample in VMEM.

    Mirrors the XLA int8 path (models/resnet.py _quant_infer +
    ops/quant.py conv_int8) op-for-op so the int8 grids are identical:
    activations quantize from the bf16 intermediates with the SAME
    static scales, accumulate s32 (exact), dequantize with
    act_scale*w_scale[o] in fp32, bias post-dequant, cast to the trunk
    dtype between convs. The win over XLA is pure HBM traffic: the
    bf16 + int8 copies of both intermediates never leave VMEM.

    inv_ref: (3,) fp32 = 1/act_scale for conv1/conv2/conv3 inputs
    (SMEM). m*_ref: fp32 dequant vectors act_scale * w_scale[o].
    conv2's int8 windows are zero-padded — exact: quantize(0) == 0 on
    a symmetric grid, identical to XLA padding the quantized operand.
    """
    f32 = jnp.float32
    x = x_ref[0]                                   # (H, W, C) bf16
    c = x.shape[-1]
    hw = h * w
    xf = x.reshape(hw, c)
    inv_in, inv1, inv2 = inv_ref[0], inv_ref[1], inv_ref[2]

    def quant(v, inv_s):
        return jnp.clip(jnp.round(v.astype(f32) * inv_s),
                        -127, 127).astype(jnp.int8)

    xq = quant(xf, inv_in)
    a1 = jnp.dot(xq, w1_ref[...], preferred_element_type=jnp.int32)
    y1 = jnp.maximum((a1.astype(f32) * m1_ref[...]
                      + b1_ref[...]).astype(x.dtype), 0)
    y1p = jnp.pad(quant(y1, inv1).reshape(h, w, mid),
                  ((1, 1), (1, 1), (0, 0)))

    bh = h // n_bands
    for j in range(n_bands):
        seg = y1p[bh * j:bh * j + bh + 2]          # (bh+2, W+2, mid) s8
        cols = [seg[dy:dy + bh, dx:dx + w].reshape(bh * w, mid)
                for dy in range(3) for dx in range(3)]
        ycat = jnp.concatenate(cols, axis=-1)      # (bh*W, 9*mid) s8
        a2 = jnp.dot(ycat, w2_ref[...], preferred_element_type=jnp.int32)
        y2 = jnp.maximum((a2.astype(f32) * m2_ref[...]
                          + b2_ref[...]).astype(x.dtype), 0)
        a3 = jnp.dot(quant(y2, inv2), w3_ref[...],
                     preferred_element_type=jnp.int32)
        y3 = (a3.astype(f32) * m3_ref[...] + b3_ref[...]).astype(x.dtype)
        if has_down:
            xqb = xq[bh * w * j:bh * w * (j + 1)]
            res = (jnp.dot(xqb, wd_ref[...],
                           preferred_element_type=jnp.int32).astype(f32)
                   * md_ref[...] + bd_ref[...]).astype(x.dtype)
        else:
            res = xf[bh * w * j:bh * w * (j + 1)]
        band = jnp.maximum(y3 + res, 0.0)
        out_ref[0, bh * j:bh * (j + 1)] = band.astype(
            out_ref.dtype).reshape(bh, w, -1)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "bands"))
def fused_bottleneck_int8_infer(x: jnp.ndarray,
                                w1: jnp.ndarray, b1: jnp.ndarray,
                                w2: jnp.ndarray, b2: jnp.ndarray,
                                w3: jnp.ndarray, b3: jnp.ndarray,
                                s_in: jnp.ndarray, s_mid1: jnp.ndarray,
                                s_mid2: jnp.ndarray,
                                wd: jnp.ndarray | None = None,
                                bd: jnp.ndarray | None = None,
                                interpret: bool = False,
                                bands: int = 1) -> jnp.ndarray:
    """One fused stride-1 bottleneck block, INT8 static-scale inference.

    Same contract as ``fused_bottleneck_infer`` plus the three
    calibrated activation scales (scalars from the "quant_stats"
    collection: conv1_in — also the downsample input — conv2_in,
    conv3_in). Weights arrive BN-FOLDED in fp32 ((C,M)/(3,3,M,M)/(M,O))
    and are quantized per output channel here (trace-time algebra,
    ops/quant.py:quantize_weight_per_channel). STATIC scales only: the
    dynamic mode's whole-batch |max| is a cross-sample reduction this
    per-sample grid cannot see, so dynamic stays on the XLA path.
    """
    from dir_tpu.ops.quant import quantize_weight_per_channel

    b, h, w, c = x.shape
    mid = w1.shape[-1]
    o = w3.shape[-1]
    has_down = wd is not None
    if not has_down:
        wd = jnp.zeros((c, o), jnp.float32)
        bd = jnp.zeros((o,), jnp.float32)
    dt = x.dtype
    f32 = jnp.float32

    w1q, sw1 = quantize_weight_per_channel(w1)
    w2q, sw2 = quantize_weight_per_channel(w2.reshape(9 * mid, mid))
    w3q, sw3 = quantize_weight_per_channel(w3)
    wdq, swd = quantize_weight_per_channel(wd)

    s_in = s_in.astype(f32)
    s_mid1 = s_mid1.astype(f32)
    s_mid2 = s_mid2.astype(f32)
    inv = jnp.stack([1.0 / s_in, 1.0 / s_mid1, 1.0 / s_mid2])
    m1 = s_in * sw1
    m2 = s_mid1 * sw2
    m3 = s_mid2 * sw3
    md = s_in * swd

    assert h % bands == 0, (h, bands)
    kernel = functools.partial(_quant_kernel, h=h, w=w, mid=mid,
                               has_down=has_down, n_bands=bands)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops_333 = 2 * h * w * (c * mid + 9 * mid * mid + mid * o
                             + (c * o if has_down else 0))
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec, wspec, wspec,
            wspec, wspec, wspec, wspec,
        ],
        out_specs=pl.BlockSpec((1, h, w, o), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), dt),
        cost_estimate=cost_if_static(
            # int8 MACs counted as 2 flops (the scheduler only needs
            # relative weight); HBM = bf16 input + output only
            flops=b * flops_333,
            bytes_accessed=b * h * w * (c + o) * x.dtype.itemsize,
        ),
        interpret=interpret,
    )(inv, x, w1q, m1, b1.astype(f32), w2q, m2, b2.astype(f32),
      w3q, m3, b3.astype(f32), wdq, md, bd.astype(f32))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_stem_bottleneck(x: jnp.ndarray,
                          g1: jnp.ndarray, t1: jnp.ndarray,
                          w1: jnp.ndarray, b1: jnp.ndarray,
                          w2: jnp.ndarray, b2: jnp.ndarray,
                          w3: jnp.ndarray, b3: jnp.ndarray,
                          wd: jnp.ndarray, bd: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """stem BN + ReLU + maxpool(3x3/2, pad 1) + the projection
    bottleneck (layer1_0) in ONE kernel, fed by the RAW stem-conv
    output. Keeping the Pallas boundary at the stem conv matters: a
    boundary at the pool output costs a 268 MB relayout copy + an
    unfused reduce-window in XLA (measured ~5 ms at batch 256).

    Args:
        x: (B, 2H, 2W, C) raw stem conv output (C=64; bf16 recommended).
        g1, t1: (C,) inference-BN affine (g = scale/sqrt(var+eps),
            t = bias - mean*g).
        w1 (C, M), b1 (M,), w2 (3, 3, M, M), b2 (M,), w3 (M, O), b3 (O,):
            folded bottleneck weights; wd (C, O), bd (O,): folded
            projection for the residual.
    Returns:
        (B, H, W, O), dtype of x.
    """
    b, h2, w2_, c = x.shape
    h, w = h2 // 2, w2_ // 2
    # _stem_kernel schedules n_bands=4 row bands of the pooled output and
    # pairs input rows two-at-a-time; non-divisible heights would drop
    # rows silently.
    assert h % 4 == 0 and h2 % 2 == 0 and w2_ % 2 == 0, (
        f"fused_stem_bottleneck needs pooled h % 4 == 0, got input {x.shape}")
    mid = w1.shape[-1]
    o = w3.shape[-1]
    dt = x.dtype
    # paired-W layout: (2H, 2W, C) -> (2H, W, 2C), contiguous (free)
    xp = x.reshape(b, h2, w, 2 * c)
    kernel = functools.partial(_stem_kernel, h=h, w=w, c=c, mid=mid)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    flops = 2 * h * w * (c * mid + 9 * mid * mid + mid * o + c * o)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h2, w, 2 * c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            wspec, wspec, wspec, wspec, wspec, wspec, wspec, wspec,
            wspec, wspec,
        ],
        out_specs=pl.BlockSpec((1, h, w, o), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, o), dt),
        cost_estimate=cost_if_static(
            flops=b * flops,
            bytes_accessed=b * h * w * (4 * c + o) * x.dtype.itemsize,
        ),
        interpret=interpret,
    )(xp, g1.astype(jnp.float32), t1.astype(jnp.float32),
      w1.astype(dt), b1.astype(jnp.float32),
      w2.reshape(9 * mid, mid).astype(dt), b2.astype(jnp.float32),
      w3.astype(dt), b3.astype(jnp.float32),
      wd.astype(dt), bd.astype(jnp.float32))
