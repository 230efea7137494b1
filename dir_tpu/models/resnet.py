"""ResNet-50 backbone returning the 4-level feature pyramid (NHWC).

Matches the torchvision-style v1.5 bottleneck network the reference uses
(models/backbone/resnet.py:85-258): stride-2 at the 3x3 conv, no
avgpool/fc (the reference builds them but never calls them in the pyramid
path — we simply don't have them). Returns [c1, c2, c3, c4] at strides
4/8/16/32 with channels 256/512/1024/2048.

ImageNet weights: the reference copies torchvision IMAGENET1K_V2 weights
at construction (models/dir.py:490-498). Here pretrained weights come via
the checkpoint converter (dir_tpu.train.checkpoint.import_torch_resnet50)
when a local torchvision state-dict file is available — there is no
network download inside model construction.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

import os as _os

from dir_tpu.models.layers import (BN_EPS, TorchBatchNorm,
                                   conv_kernel_init, stat_barrier)

# Split-K weight-gradient experiment for the backbone's 1x1 convs
# (see ops/conv1x1.py). 0 = standard nn.Conv.
_CONV1X1_SPLITK = int(_os.environ.get("CONV1X1_SPLITK", "0"))

# Row bands for the fused Pallas path at the 32x32 (layer2) shape,
# where the whole-map kernel's Mosaic compile does not terminate
# (ops/pallas_bottleneck.py header) but the row-banded schedule
# compiles and wins IN ISOLATION: 2.57 vs 3.71 ms/block XLA at b256
# bf16 (tools/bench_bottleneck.py, BANDS=4). MEASURED NEGATIVE
# IN-MODEL: eval 5,992 img/s with layer2 fused vs 6,159 without (same
# build) — the three kernel boundaries forbid XLA's cross-block
# fusions around layer2 and cost more than the per-block win. Default
# 0 = layer2 stays on XLA; flag retained for future Mosaic/XLA.
_FUSED_L2_BANDS = int(_os.environ.get("FUSED_L2_BANDS", "0"))

# Fused INT8 Pallas bottleneck (ops/pallas_bottleneck.py
# _quant_kernel) for the static-scale serving path: whole block in
# VMEM, int8 matmuls, no per-conv HBM round-trips. Isolation bench
# (tools/bench_int8_block.py, b256): 3.08 vs 6.29 ms/block XLA-int8 at
# the layer1 shape. 1 = engage at spatial>=4096 (layer1 identity
# blocks); 0 = pure XLA int8. In-model A/B pending — see DESIGN.md §8.
_QUANT_FUSED = int(_os.environ.get("QUANT_FUSED", "0"))
# Row bands for the int8 kernel at the layer2 shape (0 = layer2 XLA).
_QUANT_FUSED_L2 = int(_os.environ.get("QUANT_FUSED_L2", "0"))


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: object = jnp.float32
    # Inference-only fused Pallas path (ops/pallas_bottleneck.py): the
    # whole block runs in VMEM with BN folded into the convs — ~2x the
    # XLA block at the HBM-bound 64^2 shapes. Train + stride-2 blocks
    # always use the XLA path; parameters are identical either way.
    fused_eval: bool = False
    # Inference-only int8 path (ops/quant.py): BN-folded convs run
    # s8 x s8 -> s32 on the MXU's double-rate int8 path. Applies to
    # the blocks the fused Pallas guard does not take (when both flags
    # are set layer1 stays Pallas — measured best — and int8 takes the
    # compute-bound layer2+). PTQ numerics, serving option only.
    quant_eval: bool = False
    # Static (calibrated) activation scales from the "quant_stats"
    # collection instead of live per-batch |max| (ops/quant.py:
    # module_act_scale). Requires a calibration pass.
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        # The per-sample-grid kernel wins where XLA is HBM-bound: layer1
        # (64^2 spatial; measured 3.1 vs 6.1 ms/block at batch 256).
        # Guards from measurement: layer2 (32^2x512) wins in isolation
        # via the row-banded schedule (2.57 vs 3.71 ms/block) but LOSES
        # in-model (5,992 vs 6,159 img/s — kernel boundaries forbid
        # XLA's cross-block fusions), so it stays XLA unless
        # FUSED_L2_BANDS is set; layer3+ is compute-bound (XLA's
        # batched convs run at 130-180 TF/s); inputs with <128 channels
        # force a half-empty-lane default layout on the kernel operand,
        # and XLA pays a 268 MB relayout copy plus an unfused
        # reduce-window upstream — costlier than the fusion saves (so
        # layer1_0, whose input is the 64-ch pool, stays XLA).
        spatial = x.shape[1] * x.shape[2]
        if (self.fused_eval and not train and self.stride == 1
                and x.shape[-1] >= 128 and not self.is_initializing()
                and (spatial >= 4096
                     or (spatial >= 1024 and _FUSED_L2_BANDS))):
            return self._fused_infer(
                x, bands=0 if spatial >= 4096 else _FUSED_L2_BANDS)
        if self.quant_eval and not train and not self.is_initializing():
            return self._quant_infer(x)

        def bn(name):
            return TorchBatchNorm(use_running_average=not train,
                                  dtype=self.dtype, name=name)

        def conv_1x1(features, name, inp):
            if _CONV1X1_SPLITK:
                from dir_tpu.ops.conv1x1 import Conv1x1SplitK
                return Conv1x1SplitK(features, split=_CONV1X1_SPLITK,
                                     dtype=self.dtype, name=name)(inp)
            return nn.Conv(features, (1, 1), use_bias=False,
                           kernel_init=conv_kernel_init, dtype=self.dtype,
                           name=name)(inp)

        identity = x
        out = conv_1x1(self.planes, "conv1", x)
        out = nn.relu(bn("bn1")(stat_barrier(out, train)))
        # Explicit symmetric padding=1, matching torch Conv2d(padding=1)
        # (reference models/backbone/resnet.py:35-37). "SAME" is NOT
        # equivalent under stride 2: XLA resolves it to asymmetric (0, 1)
        # padding on even inputs, shifting every tap by one pixel.
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=((1, 1), (1, 1)), use_bias=False,
                      kernel_init=conv_kernel_init, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(bn("bn2")(stat_barrier(out, train)))
        out = conv_1x1(self.planes * self.expansion, "conv3", out)
        out = bn("bn3")(stat_barrier(out, train))

        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=conv_kernel_init,
                               dtype=self.dtype, name="down_conv")(x)
            identity = bn("down_bn")(stat_barrier(identity, train))
        return nn.relu(out + identity)

    def _fused_infer(self, x: jnp.ndarray, bands: int = 0) -> jnp.ndarray:
        """Fold the BNs and run the whole block as one Pallas kernel.

        Reads the variables the XLA branch created at init — the
        parameter tree is identical; only execution differs."""
        import jax

        from dir_tpu.ops.pallas_bottleneck import (fold_bn,
                                                   fused_bottleneck_infer)

        p = lambda n: self.get_variable("params", n)  # noqa: E731
        s = lambda n: self.get_variable("batch_stats", n)  # noqa: E731

        def fold(conv, bnn):
            return fold_bn(p(conv)["kernel"], p(bnn)["scale"],
                           p(bnn)["bias"], s(bnn)["mean"], s(bnn)["var"],
                           BN_EPS)

        w1, b1 = fold("conv1", "bn1")
        w2, b2 = fold("conv2", "bn2")
        w3, b3 = fold("conv3", "bn3")
        wd = bd = None
        if self.downsample:
            wd, bd = fold("down_conv", "down_bn")
            wd = wd[0, 0]
        return fused_bottleneck_infer(
            x.astype(self.dtype), w1[0, 0], b1, w2, b2, w3[0, 0], b3,
            wd, bd, interpret=jax.default_backend() != "tpu",
            bands=bands)

    def _quant_infer(self, x: jnp.ndarray) -> jnp.ndarray:
        """Run the block's convs int8-quantized (ops/quant.py).

        Same variable tree as the XLA branch; BN is folded into each
        conv (exact), the folded kernels are quantized per output
        channel, activations per-tensor dynamically. Residual add +
        relu stay in the trunk dtype."""
        import jax

        from dir_tpu.ops.pallas_bottleneck import (
            fold_bn, fused_bottleneck_int8_infer)
        from dir_tpu.ops.quant import module_act_scale, quant_conv

        p = lambda n: self.get_variable("params", n)  # noqa: E731
        s = lambda n: self.get_variable("batch_stats", n)  # noqa: E731

        def fold(conv, bnn):
            return fold_bn(p(conv)["kernel"], p(bnn)["scale"],
                           p(bnn)["bias"], s(bnn)["mean"], s(bnn)["var"],
                           BN_EPS)

        def scale(name, v):
            return module_act_scale(self, name, v, self.quant_static)

        w1, b1 = fold("conv1", "bn1")
        w2, b2 = fold("conv2", "bn2")
        w3, b3 = fold("conv3", "bn3")

        # Fused int8 Pallas path (QUANT_FUSED): static scales only (the
        # dynamic mode's whole-batch |max| is a cross-sample reduction
        # the per-sample grid cannot see), never while calibrating (the
        # XLA path records the amaxes), stride-1, and >=128 input
        # channels (the same half-lane Mosaic boundary as the bf16
        # kernel). layer1 at spatial>=4096; layer2 via QUANT_FUSED_L2
        # bands.
        spatial = x.shape[1] * x.shape[2]
        if (_QUANT_FUSED and self.quant_static and self.stride == 1
                and x.shape[-1] >= 128
                and not self.is_mutable_collection("quant_stats")
                and (spatial >= 4096
                     or (spatial >= 1024 and _QUANT_FUSED_L2))):
            wd = bd = None
            if self.downsample:
                wd, bd = fold("down_conv", "down_bn")
                wd = wd[0, 0]
            return fused_bottleneck_int8_infer(
                x.astype(self.dtype), w1[0, 0], b1, w2, b2, w3[0, 0], b3,
                scale("conv1_in", x), scale("conv2_in", x),
                scale("conv3_in", x), wd, bd,
                interpret=jax.default_backend() != "tpu",
                bands=1 if spatial >= 4096 else _QUANT_FUSED_L2)

        out = nn.relu(quant_conv(x, w1, bias=b1, out_dtype=self.dtype,
                                 act_scale=scale("conv1_in", x)))
        out = nn.relu(quant_conv(out, w2, (self.stride, self.stride),
                                 ((1, 1), (1, 1)), b2, self.dtype,
                                 act_scale=scale("conv2_in", out)))
        out = quant_conv(out, w3, bias=b3, out_dtype=self.dtype,
                         act_scale=scale("conv3_in", out))

        identity = x.astype(self.dtype)
        if self.downsample:
            wd, bd = fold("down_conv", "down_bn")
            identity = quant_conv(x, wd, (self.stride, self.stride),
                                  "SAME", bd, self.dtype,
                                  act_scale=scale("down_in", x))
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """Two-3x3-conv residual block (reference models/backbone/resnet.py:36-83).

    Used by the reference's vendored resnet18/34 constructors
    (resnet.py:271-296); DIR itself hardcodes resnet50
    (models/dir.py:490), so this exists for constructor-surface parity.
    Stride sits on the FIRST conv (unlike Bottleneck v1.5's second)."""

    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1
    dtype: object = jnp.float32
    fused_eval: bool = False  # accepted for API symmetry; no fused path
    quant_eval: bool = False  # accepted for API symmetry; no int8 path
    quant_static: bool = False  # accepted for API symmetry

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def bn(name):
            return TorchBatchNorm(use_running_average=not train,
                                  dtype=self.dtype, name=name)

        def conv_3x3(name, inp, stride):
            # symmetric padding=1 — see the Bottleneck conv2 comment
            return nn.Conv(self.planes, (3, 3), strides=(stride, stride),
                           padding=((1, 1), (1, 1)), use_bias=False,
                           kernel_init=conv_kernel_init, dtype=self.dtype,
                           name=name)(inp)

        identity = x
        out = conv_3x3("conv1", x, self.stride)
        out = nn.relu(bn("bn1")(stat_barrier(out, train)))
        out = conv_3x3("conv2", out, 1)
        out = bn("bn2")(stat_barrier(out, train))
        if self.downsample:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, kernel_init=conv_kernel_init,
                               dtype=self.dtype, name="down_conv")(x)
            identity = bn("down_bn")(stat_barrier(identity, train))
        return nn.relu(out + identity)


def space_to_depth(x: jnp.ndarray, block: int = 2) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/b, W/b, b*b*C), channel index
    ((a*b)+bb)*C + c for intra-block offset (a, bb)."""
    b_, h, w, c = x.shape
    x = x.reshape(b_, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b_, h // block, w // block, block * block * c)


def stem_weights_to_s2d(w7: jnp.ndarray) -> jnp.ndarray:
    """Exact rewrite of the 7x7/stride-2 stem kernel (7, 7, C, O) into the
    4x4/stride-1 kernel (4, 4, 4C, O) applied after space_to_depth(2)
    with padding (2, 1) — the classic MLPerf-ResNet TPU stem trick.

    Derivation: output (i, j) of the original conv reads input rows
    2i+di-3, di in [0, 7); in 2-block coordinates row r = 2p+a, so
    di = 2*pi - 1 + a for block-row offset pi in [0, 4). Entries with
    di outside [0, 7) are zero.
    """
    import numpy as np
    w7 = np.asarray(w7)
    c, o = w7.shape[2], w7.shape[3]
    w4 = np.zeros((4, 4, 4 * c, o), w7.dtype)
    for pi in range(4):
        for pj in range(4):
            for a in range(2):
                for b_ in range(2):
                    di = 2 * pi - 1 + a
                    dj = 2 * pj - 1 + b_
                    if 0 <= di < 7 and 0 <= dj < 7:
                        ch = (a * 2 + b_) * c
                        w4[pi, pj, ch:ch + c] = w7[di, dj]
    return jnp.asarray(w4)


class ResNetPyramid(nn.Module):
    """ResNet backbone emitting [c1, c2, c3, c4].

    stem: "conv7" is the torchvision layout; "s2d" applies
    space-to-depth(2) then an equivalent 4x4/stride-1 conv — better MXU
    utilization on the 256^2 input (use stem_weights_to_s2d to convert
    imported 7x7 weights exactly).
    """

    layers: Sequence[int] = (3, 4, 6, 3)  # resnet50
    block: str = "bottleneck"  # "bottleneck" (expansion 4) | "basic" (1)
    dtype: object = jnp.float32
    stem: str = "conv7"
    fused_eval: bool = False  # see Bottleneck.fused_eval
    quant_eval: bool = False  # see Bottleneck.quant_eval
    quant_static: bool = False  # see Bottleneck.quant_static
    # Int8 stem conv with bn1 folded in (cfg.quant_aux_eval; the input
    # image is natively 8-bit, so the input grid is near-lossless).
    quant_stem: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        x = x.astype(self.dtype)
        q_stem = (self.quant_stem and not train
                  and not self.is_initializing())
        if q_stem:
            from dir_tpu.ops.quant import module_quant_conv
        if self.stem == "s2d":
            x = space_to_depth(x, 2)
            if q_stem:
                x = module_quant_conv(self, "conv1", x,
                                      padding=((2, 1), (2, 1)),
                                      static=self.quant_static,
                                      out_dtype=self.dtype,
                                      fold_bn_name="bn1", bn_eps=BN_EPS)
            else:
                x = nn.Conv(64, (4, 4), strides=(1, 1),
                            padding=((2, 1), (2, 1)), use_bias=False,
                            kernel_init=conv_kernel_init, dtype=self.dtype,
                            name="conv1")(x)
        elif q_stem:
            x = module_quant_conv(self, "conv1", x, stride=(2, 2),
                                  padding=((3, 3), (3, 3)),
                                  static=self.quant_static,
                                  out_dtype=self.dtype,
                                  fold_bn_name="bn1", bn_eps=BN_EPS)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2),
                        padding=((3, 3), (3, 3)),
                        use_bias=False, kernel_init=conv_kernel_init,
                        dtype=self.dtype, name="conv1")(x)
        if not q_stem:
            x = TorchBatchNorm(use_running_average=not train,
                               dtype=self.dtype,
                               name="bn1")(stat_barrier(x, train))
        x = nn.relu(x)
        # reduce_window + select_and_scatter cost ~2.7 ms/step (b64) —
        # ~8x roofline — but the shifted-strided-slice reformulation
        # (ops/pool.py) measured WORSE end-to-end (79.3 vs 64.2 ms/step:
        # sublane-strided W slices + pad-scatter backward lose more than
        # the window ops cost). Documented negative result; keep XLA's
        # native lowering.
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        feats = []
        planes = (64, 128, 256, 512)
        blk = Bottleneck if self.block == "bottleneck" else BasicBlock
        expansion = 4 if self.block == "bottleneck" else 1
        for stage, (blocks, p) in enumerate(zip(self.layers, planes)):
            stride = 1 if stage == 0 else 2
            # torchvision adds the 1x1 downsample exactly when the
            # residual shapes mismatch (resnet.py:192-199): always for
            # Bottleneck's layerN_0 (channel expansion), but NOT for
            # BasicBlock's layer1_0 (64ch in, 64ch out, stride 1).
            down = stride != 1 or x.shape[-1] != p * expansion
            x = blk(p, stride=stride, downsample=down,
                    dtype=self.dtype, fused_eval=self.fused_eval,
                    quant_eval=self.quant_eval,
                    quant_static=self.quant_static,
                    name=f"layer{stage + 1}_0")(x, train)
            for b in range(1, blocks):
                x = blk(p, dtype=self.dtype,
                        fused_eval=self.fused_eval,
                        quant_eval=self.quant_eval,
                        quant_static=self.quant_static,
                        name=f"layer{stage + 1}_{b}")(x, train)
            feats.append(x)
        return feats


def resnet50() -> ResNetPyramid:
    return ResNetPyramid(layers=(3, 4, 6, 3))


def resnet18() -> ResNetPyramid:
    """Reference resnet.py:271-273 (vendored, unused by DIR)."""
    return ResNetPyramid(layers=(2, 2, 2, 2), block="basic")


def resnet34() -> ResNetPyramid:
    """Reference resnet.py:276-296 (vendored, unused by DIR)."""
    return ResNetPyramid(layers=(3, 4, 6, 3), block="basic")
