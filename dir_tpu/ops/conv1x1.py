"""Split-K 1x1 convolution (weight-gradient experiment).

The train profile (docs/DESIGN.md §7) shows ~8 ms/step of huge-K
weight-gradient matmuls: a (1, 1, 64, 256) filter gradient contracts
over K = B*H*W = 262144 with a 64x256 output — two 128x128 MXU tiles
and one serial K loop, measured 19-45 TF/s. This module computes the
same 1x1 conv with a custom VJP whose weight gradient is an S-way
split-K batched matmul ((S, K/S, C) x (S, K/S, O) -> (S, C, O), f32
accumulation) followed by a reduction, giving the scheduler S
independent tile-jobs instead of one long contraction.

Numerics: forward and data gradient are the identical dot; the weight
gradient accumulates each K-chunk in f32 exactly like XLA's conv
gradient, with one extra f32 add tree over S partials (benign
reassociation). Parameter layout matches flax ``nn.Conv`` — kernel
shape (1, 1, C, O) under the same name — so checkpoints are unchanged.

Enabled via ``CONV1X1_SPLITK=<S>`` (see models/resnet.py).

MEASURED NEGATIVE (v5e, b64, UNROLL=4, S=8): 73.9 vs 61.4 ms/step.
Replacing the backbone's 1x1 convs with this formulation loses XLA's
conv-gradient lowering and its weight-grad+AdamW fusions; the split-K
batched dot does not recover the difference. Together with the
BN-stat-barrier negative (models/layers.py), this confirms the §7
claim that the remaining <60 TF/s kernel mass is compiler-bound, not
addressable from JAX source. Kept (off by default, oracle-tested in
tests/test_conv1x1.py) as a reproducible experiment for future XLA
versions.
"""

from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

# Kaiming-normal fan_out — same init as models/layers.conv_kernel_init
# (not imported: ops/ must not depend on models/).
conv_kernel_init = nn.initializers.variance_scaling(2.0, "fan_out",
                                                    "truncated_normal")


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv1x1(x: jnp.ndarray, w: jnp.ndarray, split: int) -> jnp.ndarray:
    """x: (B, H, W, C), w: (C, O) -> (B, H, W, O)."""
    return jnp.einsum("bhwc,co->bhwo", x, w)


def _conv1x1_fwd(x, w, split):
    return conv1x1(x, w, split), (x, w)


def _conv1x1_bwd(split, res, g):
    x, w = res
    dx = jnp.einsum("bhwo,co->bhwc", g, w)
    b, h, wd, c = x.shape
    o = g.shape[-1]
    k = b * h * wd
    s = split if (split > 0 and k % split == 0) else 1
    xs = x.reshape(s, k // s, c)
    gs = g.reshape(s, k // s, o)
    dws = jax.lax.dot_general(xs, gs, (((1,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    dw = dws.sum(axis=0).astype(w.dtype)
    return dx, dw


conv1x1.defvjp(_conv1x1_fwd, _conv1x1_bwd)


class Conv1x1SplitK(nn.Module):
    """Drop-in for ``nn.Conv(features, (1, 1), use_bias=False)`` with the
    split-K weight gradient. Same parameter name/shape/init."""

    features: int
    split: int = 8
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param("kernel", conv_kernel_init,
                       (1, 1, x.shape[-1], self.features), jnp.float32)
        return conv1x1(x.astype(self.dtype), w[0, 0].astype(self.dtype),
                       self.split)
