"""Shared conv building blocks (NHWC, flax.linen).

``Residual`` is the hourglass bottleneck residual used throughout the
decoder (reference: models/backbone/hourglass.py:33-70): BN-ReLU-1x1 ->
BN-ReLU-3x3 -> BN-ReLU-1x1 with a 1x1 skip when channel counts differ.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch BatchNorm defaults: eps=1e-5, momentum=0.1 (flax momentum is the
# retained fraction of the old stat => 0.9).
BN_MOMENTUM = 0.9
BN_EPS = 1e-5

# Kaiming-normal fan_out, matching the reference's conv init
# (models/dir.py:77-84 and torchvision's ResNet init).
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out",
                                                    "truncated_normal")

# Train-mode BN-stat fusion control (perf experiment, BN_BARRIER=N):
# XLA fuses the per-channel batch-stat reductions into the producing
# conv's epilogue ("convert_reduce_fusion" kernels); the reductions
# serialize against the conv and a 0.06 ms conv can cost >1 ms fused
# (docs/DESIGN.md §7). Barriering the BN input forbids that fusion:
# the conv runs pure and the stats become a separate bandwidth-bound
# re-read. BN_BARRIER=N barriers only spatial inputs with H*W >= N, so
# the experiment can target the layer1/stem shapes where the fused
# kernels are furthest from light (N=1: everywhere; 0/unset: off).
# MEASURED NEGATIVE at N=1 (v5e, b64, UNROLL=4): 67.9 vs 61.4 ms/step
# — the blanket barrier forces extra materialization and blocks
# profitable normalize/backward fusions, losing more than the stat
# epilogue costs. Kept off by default; flag retained so the
# experiment is reproducible selectively and on future XLA versions.
import os as _os

_BN_BARRIER = int(_os.environ.get("BN_BARRIER", "0"))

# Concat-free pair path in Residual. Measured (v5e, same build):
# eval b256 6,159 vs 6,126 img/s in favor of the pair path; train b64
# 61.33 vs 60.94 ms AGAINST it (the split conv1/bn1 backward loses
# more fusion than the concat copies cost). Default 1 = eval-only.
# PAIR_FUSION=0 never, 2 = also in training (re-measurement knob).
# Parameter tree is identical in every mode.
_PAIR_FUSION = int(_os.environ.get("PAIR_FUSION", "1"))

# upsample2x lowering (UPSAMPLE_TCONV=0 reverts to jax.image.resize):
# the resize lowering profiled ~6x off HBM roofline in-model (1.62
# ms/step at eval b256). The default expresses the SAME half-pixel
# bilinear 2x as an edge-pad + depthwise transposed conv
# (lhs_dilation=2, taps [0.25 0.75 0.75 0.25] per axis) — exact algebra
# (tests/test_layers_upsample.py), different XLA lowering. In isolation
# the two tie at the dispatch floor, but IN-MODEL the tconv wins every
# program (v5e, 2026-08-19 same-session A/Bs): fp eval 6,471-6,478 vs
# ~6,170 img/s (+4.9%), int8-static serving 7,780 vs 7,565 (+2.8%),
# train step 60.20 vs 61.06 ms (+1.4% — the resize gather backward
# becomes a conv backward). Default ON by measurement.
_UPSAMPLE_TCONV = int(_os.environ.get("UPSAMPLE_TCONV", "1"))


def stat_barrier(x: jnp.ndarray, train: bool) -> jnp.ndarray:
    if (train and _BN_BARRIER and x.ndim == 4
            and x.shape[1] * x.shape[2] >= _BN_BARRIER):
        return jax.lax.optimization_barrier(x)
    return x


def conv_init_normal(std: float):
    return nn.initializers.normal(stddev=std)


# Shifted single-pass batch moments (BN_SHIFTED=0 reverts to two-pass).
# The two-pass variance E[(x-mu)^2] is numerically ideal but its second
# reduction DEPENDS on the first, so XLA must read the activation from
# HBM twice per BN (train fwd + again in bwd) — measured +4.2 ms on the
# b64 train step (60.3 -> 64.5 ms) when it replaced flax's fast path.
# The textbook shifted-data algorithm recovers the single fused pass
# without the fast path's catastrophic fp32 cancellation: center on an
# x-INDEPENDENT shift s ~= mean (the running mean, stop_gradient), then
#   var = E[(x-s)^2] - (E[x-s])^2
# cancels only (mu-s)^2 ~ 0 instead of mu^2 >> var. Exact algebra (s
# drops out of both mean and var), identical gradients; the fp32
# robustness is pinned against an fp64 oracle on the |mean| >> std
# fixture that exposed the fast-path bug
# (tests/test_reference_oracle_grad.py::test_bn_fp32_moment_stability).
_BN_SHIFTED = int(_os.environ.get("BN_SHIFTED", "1"))


def _batch_moments(xf: jnp.ndarray, axes, shift: jnp.ndarray):
    if _BN_SHIFTED:
        s = jax.lax.stop_gradient(shift).astype(xf.dtype)
        y = xf - s
        my = y.mean(axis=axes)
        var = jnp.maximum(jnp.square(y).mean(axis=axes) - jnp.square(my),
                          0.0)
        return my + s, var
    mu = xf.mean(axis=axes)
    return mu, jnp.square(xf - mu).mean(axis=axes)


class ConvBNRelu(nn.Module):
    """Conv -> optional BN -> optional ReLU."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_bn: bool = True
    use_relu: bool = True
    use_bias: bool = True
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride), padding="SAME",
                    use_bias=self.use_bias, kernel_init=conv_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = TorchBatchNorm(use_running_average=not train,
                               dtype=self.dtype,
                               name="bn")(stat_barrier(x, train))
        if self.use_relu:
            x = nn.relu(x)
        return x


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's running-statistics semantics.

    Differences vs flax nn.BatchNorm, both torch-parity requirements
    found by the gradient/trajectory oracles
    (tests/test_reference_oracle_grad.py):
      * two-pass batch variance (flax's default fast E[x^2]-E[x]^2
        cancels catastrophically in fp32 when |mean| >> std, skewing
        sigma and the whole BN backward);
      * the running-var update uses the UNBIASED estimate
        (x n/(n-1), torch _BatchNorm) while normalization stays biased
        — flax feeds the biased value to both, skewing eval-mode stats
        by n/(n-1) (2.4% at the 42-token MLP BatchNorm1ds).

    Parameter/batch_stats tree (scale/bias, mean/var) is IDENTICAL to
    nn.BatchNorm, so checkpoints are interchangeable.
    """

    use_running_average: bool
    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,),
                          jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        if self.use_running_average:
            mu, var = ra_mean.value, ra_var.value
        else:
            # stats in at-least-fp32 (fp64 under the fp64 oracle);
            # single-pass shifted moments, see _batch_moments
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            axes = tuple(range(x.ndim - 1))
            mu, var = _batch_moments(xf, axes, ra_mean.value)
            if not self.is_initializing():
                n = x.size // feat
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mu
                ra_var.value = (m * ra_var.value
                                + (1 - m) * var * (n / max(n - 1, 1)))
        # flax op order and dtype discipline: stats at-least-fp32 above,
        # normalization in the compute dtype (bf16 on the bf16 trunk —
        # keeps the benched eval program shape; fp64 under the oracle)
        dt = jnp.dtype(self.dtype)
        mul = (jax.lax.rsqrt(var.astype(dt) + jnp.asarray(self.epsilon, dt))
               * scale.astype(dt))
        return (x.astype(dt) - mu.astype(dt)) * mul + bias.astype(dt)


class _PairBN(nn.Module):
    """BatchNorm over the virtual concat of two tensors, applied to each
    part separately — per-channel statistics split cleanly across the
    disjoint channel ranges, so ``bn(concat(a, b))`` equals
    ``concat(bn_a(a), bn_b(b))`` with sliced parameters/stats. The
    parameter/batch_stats tree (scale/bias/mean/var of size Ca+Cb) is
    IDENTICAL to nn.BatchNorm on the concat, so checkpoints convert
    unchanged. Stat formulas replicate flax with use_fast_variance=False
    (f32 two-pass variance, running update skipped at init)."""

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, a, b, train: bool = False):
        ca, cb = a.shape[-1], b.shape[-1]
        c = ca + cb
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))

        def stats(x, shift):
            # Shifted single-pass moments, NOT raw E[x^2]-E[x]^2: the
            # unshifted fast form catastrophically cancels in fp32 when
            # |mean| >> std, which poisons sigma and hence the
            # 1/sigma-scaled BN backward — found by the gradient-level
            # oracle (tests/test_reference_oracle_grad.py). See
            # _batch_moments for the shift argument.
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            return _batch_moments(xf, (0, 1, 2), shift)

        if train:
            mu_a, var_a = stats(stat_barrier(a, train), ra_mean.value[:ca])
            mu_b, var_b = stats(stat_barrier(b, train), ra_mean.value[ca:])
            if not self.is_initializing():
                m = self.momentum
                # unbiased running-var update, matching TorchBatchNorm
                na = a.size // ca
                nb = b.size // cb
                ra_mean.value = (m * ra_mean.value + (1 - m)
                                 * jnp.concatenate([mu_a, mu_b]))
                ra_var.value = (m * ra_var.value + (1 - m)
                                * jnp.concatenate(
                                    [var_a * (na / max(na - 1, 1)),
                                     var_b * (nb / max(nb - 1, 1))]))
        else:
            mu_a, mu_b = ra_mean.value[:ca], ra_mean.value[ca:]
            var_a, var_b = ra_var.value[:ca], ra_var.value[ca:]

        def norm(x, mu, var, s, t):
            # flax order: mul = rsqrt * scale, then (x - mean) * mul + bias
            mul = jax.lax.rsqrt(var + self.epsilon) * s
            y = (x.astype(jnp.float32) - mu) * mul + t
            return y.astype(self.dtype)

        return (norm(a, mu_a, var_a, scale[:ca], bias[:ca]),
                norm(b, mu_b, var_b, scale[ca:], bias[ca:]))


class _PairConv1x1(nn.Module):
    """1x1 conv over the virtual concat of two tensors:
    ``conv(concat(a, b))`` = ``a @ k[:Ca] + b @ k[Ca:] + bias`` — the
    channel-concat never materializes (it is a pure HBM copy on TPU).
    Parameter tree (kernel (1,1,C,O) + bias) matches nn.Conv."""

    features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, a, b):
        ca = a.shape[-1]
        c = ca + b.shape[-1]
        kernel = self.param("kernel", conv_kernel_init,
                            (1, 1, c, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k = kernel[0, 0].astype(self.dtype)
        y = (a.astype(self.dtype) @ k[:ca]
             + b.astype(self.dtype) @ k[ca:])
        return y + bias.astype(self.dtype)


class Residual(nn.Module):
    """Hourglass pre-activation bottleneck residual
    (models/backbone/hourglass.py:33-70).

    ``pair``: optional second input — the block then behaves exactly as
    if called on ``concatenate([x, pair], -1)``; at inference the
    concat never materializes (bn1/conv1/skip split per channel range;
    exact algebra, identical parameter tree — the decoder's
    skip-fusion concats are pure HBM copies worth ~1.3 ms/step at eval
    b256). Training materializes the concat: the split backward
    measured 0.4 ms/step WORSE (see _PAIR_FUSION above)."""

    features: int
    dtype: object = jnp.float32
    # Inference-only int8 PTQ path (ops/quant.py): each conv runs
    # s8 x s8 -> s32 on its existing parameters; the pre-activation BNs
    # stay fp (elementwise). Serving option, never the parity default.
    quant_eval: bool = False
    # Static (calibrated) activation scales — see ops/quant.py:
    # module_act_scale.
    quant_static: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 pair: jnp.ndarray | None = None) -> jnp.ndarray:
        if self.quant_eval and not train and not self.is_initializing():
            return self._quant_infer(x, pair)
        half = self.features // 2
        in_dim = x.shape[-1] + (pair.shape[-1] if pair is not None else 0)

        def bn(name):
            return TorchBatchNorm(use_running_average=not train,
                                  dtype=self.dtype, name=name)

        use_pair = _PAIR_FUSION == 2 or (_PAIR_FUSION == 1 and not train)
        if pair is not None and not use_pair:
            x = jnp.concatenate([x, pair], axis=-1)
            pair = None

        if pair is not None:
            if in_dim == self.features:
                skip = jnp.concatenate([x, pair], axis=-1)
            else:
                skip = _PairConv1x1(self.features, dtype=self.dtype,
                                    name="skip")(x, pair)
            ya, yb = _PairBN(dtype=self.dtype, name="bn1")(x, pair, train)
            out = _PairConv1x1(half, dtype=self.dtype,
                               name="conv1")(nn.relu(ya), nn.relu(yb))
        else:
            if in_dim == self.features:
                skip = x
            else:
                skip = nn.Conv(self.features, (1, 1), use_bias=True,
                               kernel_init=conv_kernel_init,
                               dtype=self.dtype, name="skip")(x)
            out = nn.relu(bn("bn1")(stat_barrier(x, train)))
            out = nn.Conv(half, (1, 1), use_bias=True,
                          kernel_init=conv_kernel_init, dtype=self.dtype,
                          name="conv1")(out)
        out = nn.relu(bn("bn2")(stat_barrier(out, train)))
        out = nn.Conv(half, (3, 3), padding="SAME", use_bias=True,
                      kernel_init=conv_kernel_init, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(bn("bn3")(stat_barrier(out, train)))
        out = nn.Conv(self.features, (1, 1), use_bias=True,
                      kernel_init=conv_kernel_init, dtype=self.dtype,
                      name="conv3")(out)
        return out + skip

    def _quant_infer(self, x: jnp.ndarray,
                     pair: jnp.ndarray | None) -> jnp.ndarray:
        """Int8 execution on the block's existing variables. The pair
        concat materializes here (its HBM cost is half in int8 terms and
        the pair algebra would need per-part scales); parameter tree is
        the same as every other mode."""
        from dir_tpu.ops.quant import module_act_scale, quant_conv

        if pair is not None:
            x = jnp.concatenate([x, pair], axis=-1)

        p = lambda n: self.get_variable("params", n)  # noqa: E731
        s = lambda n: self.get_variable("batch_stats", n)  # noqa: E731

        def bn_inf(name, v):
            pr, st = p(name), s(name)
            mul = jax.lax.rsqrt(st["var"] + BN_EPS) * pr["scale"]
            y = (v.astype(jnp.float32) - st["mean"]) * mul + pr["bias"]
            return y.astype(self.dtype)

        def qc(name, v, k3=False):
            pr = p(name)
            sc = module_act_scale(self, f"{name}_in", v, self.quant_static)
            return quant_conv(v, pr["kernel"],
                              padding=((1, 1), (1, 1)) if k3 else "SAME",
                              bias=pr["bias"].astype(jnp.float32),
                              out_dtype=self.dtype, act_scale=sc)

        if x.shape[-1] == self.features:
            skip = x.astype(self.dtype)
        else:
            skip = qc("skip", x)
        out = qc("conv1", nn.relu(bn_inf("bn1", x)))
        out = qc("conv2", nn.relu(bn_inf("bn2", out)), k3=True)
        out = qc("conv3", nn.relu(bn_inf("bn3", out)))
        return out + skip


class MLP1d(nn.Module):
    """Conv1d(k=1) -> BN -> ReLU -> Conv1d(k=1) over (B, N, C) token sets.

    The reference expresses per-token MLPs as 1x1 Conv1d stacks (e.g. the
    positional embeddings at models/dir.py:31-48); on (B, N, C) data a 1x1
    conv is a Dense layer, which maps straight onto the MXU.
    """

    hidden: int
    out: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = TorchBatchNorm(use_running_average=not train,
                           dtype=self.dtype,
                           name="bn")(stat_barrier(x, train))
        x = nn.relu(x)
        x = nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        return x


class Hourglass(nn.Module):
    """Recursive hourglass (models/backbone/hourglass.py:73-97).

    Constructed-but-unused by the reference DIR; provided for parity of
    the component library (nearest-neighbor upsampling per the torch
    module's mode='nearest')."""

    depth: int
    features: int
    increase: int = 0
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        import jax
        nf = self.features + self.increase
        up1 = Residual(self.features, dtype=self.dtype, name="up1")(x, train)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = Residual(nf, dtype=self.dtype, name="low1")(low, train)
        if self.depth > 1:
            low = Hourglass(self.depth - 1, nf, dtype=self.dtype,
                            name="low2")(low, train)
        else:
            low = Residual(nf, dtype=self.dtype, name="low2")(low, train)
        low = Residual(self.features, dtype=self.dtype, name="low3")(
            low, train)
        b, h, w, c = low.shape
        up2 = jax.image.resize(low, (b, 2 * h, 2 * w, c), method="nearest")
        return up1 + up2


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsampling with torch ``nn.Upsample(align_corners=False)``
    semantics (reference: models/dir.py:392,398).

    For an exact 2x scale with align_corners=False, the output pixel i
    samples input coordinate (i + 0.5)/2 - 0.5. Three lowerings were
    measured (all exact to fp rounding):
      - explicit separable 0.75/0.25 stencil with stack-interleave:
        3.5x SLOWER than resize on TPU (the even/odd interleave becomes
        strided data formatting) — rejected round 3;
      - jax.image.resize(method='linear'): the former default;
      - depthwise transposed conv (_upsample2x_tconv): ties resize in
        isolation but wins IN-MODEL on all three programs (fp eval
        +4.9%, int8 serving +2.8%, train −0.86 ms — header comment) —
        the DEFAULT by measurement; UPSAMPLE_TCONV=0 reverts.
    """
    b, h, w, c = x.shape
    if _UPSAMPLE_TCONV:
        return _upsample2x_tconv(x)
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


def _upsample2x_tconv(x: jnp.ndarray) -> jnp.ndarray:
    """Half-pixel bilinear 2x as edge-pad + depthwise transposed conv.

    Exact rewrite of the resize: out[2i] = 0.25 in[i-1] + 0.75 in[i],
    out[2i+1] = 0.75 in[i] + 0.25 in[i+1], edges clamped — i.e. a
    4-tap [0.25, 0.75, 0.75, 0.25] kernel over the 2x input-dilated,
    edge-padded signal, separable per axis. One fused 4x4 depthwise
    conv does both axes (rank-1 kernel outer product)."""
    b, h, w, c = x.shape
    taps = jnp.asarray([0.25, 0.75, 0.75, 0.25], x.dtype)
    k = (taps[:, None] * taps[None, :])[:, :, None, None]  # (4,4,1,1)
    k = jnp.broadcast_to(k, (4, 4, 1, c))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    dn = jax.lax.conv_dimension_numbers(xp.shape, k.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        xp, k, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2), dimension_numbers=dn,
        feature_group_count=c,
        # 16 taps/channel: HIGHEST is free here, and keeps the "exact to
        # fp rounding" equivalence on-device, where default precision
        # would accumulate the fp32 parity path in bf16.
        precision=jax.lax.Precision.HIGHEST)
