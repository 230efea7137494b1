"""Oracle test for the split-K 1x1 conv (dir_tpu/ops/conv1x1.py).

Independent oracle: float64 numpy einsum for the forward and both
gradients. Also asserts the flax module's parameter tree is a drop-in
for ``nn.Conv(features, (1, 1), use_bias=False)`` (same name/shape) so
checkpoints are unaffected by the experiment flag.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from dir_tpu.ops.conv1x1 import Conv1x1SplitK, conv1x1


def test_conv1x1_splitk_matches_float64_oracle(rng):
    x64 = rng.randn(4, 4, 8, 16)
    w64 = rng.randn(16, 24)
    g64 = rng.randn(4, 4, 8, 24)
    x = jnp.asarray(x64, jnp.float32)
    w = jnp.asarray(w64, jnp.float32)
    g = jnp.asarray(g64, jnp.float32)

    for split in (1, 4, 8):
        y, vjp = jax.vjp(lambda x_, w_: conv1x1(x_, w_, split), x, w)
        dx, dw = vjp(g)
        np.testing.assert_allclose(np.asarray(y),
                                   np.einsum("bhwc,co->bhwo", x64, w64),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dx),
                                   np.einsum("bhwo,co->bhwc", g64, w64),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dw),
                                   np.einsum("bhwc,bhwo->co", x64, g64),
                                   rtol=1e-5, atol=1e-4)


def test_conv1x1_module_is_nnconv_dropin(rng):
    x = jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))
    mod = Conv1x1SplitK(12, split=4)
    ref = nn.Conv(12, (1, 1), use_bias=False)
    v = mod.init(jax.random.PRNGKey(0), x)
    vref = ref.init(jax.random.PRNGKey(0), x)
    assert (jax.tree.structure(v) == jax.tree.structure(vref))
    assert v["params"]["kernel"].shape == vref["params"]["kernel"].shape
    # identical forward on identical weights
    y = mod.apply(vref, x)
    yref = ref.apply(vref, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yref),
                               rtol=1e-6, atol=1e-6)


def test_conv1x1_non_divisible_split_falls_back(rng):
    # K = 2*3*5 = 30, split 4 does not divide -> silent fallback to 1
    x = jnp.asarray(rng.randn(2, 3, 5, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(8, 6).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 3, 5, 6).astype(np.float32))
    _, vjp = jax.vjp(lambda x_, w_: conv1x1(x_, w_, 4), x, w)
    dx, dw = vjp(g)
    np.testing.assert_allclose(
        np.asarray(dw),
        np.einsum("bhwc,bhwo->co", np.asarray(x, np.float64),
                  np.asarray(g, np.float64)), rtol=1e-5, atol=1e-5)
