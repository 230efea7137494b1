"""Fused splat+conv factorization vs the materialized path (exact)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # jit sweep over sizes, ~70 s

from dir_tpu.ops.bone_splat import bone_splat
from dir_tpu.ops.splat_conv import fused_splat_conv, splat_weights


def _materialized(uv_l, uv_r, f_l, f_r, kernel, bias, size, dist):
    splat_l = bone_splat(uv_l, f_l, size, dist)
    splat_r = bone_splat(uv_r, f_r, size, dist)
    x = jnp.concatenate([splat_l, splat_r], axis=-1)
    out = jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def test_fused_splat_conv_matches_materialized(rng):
    b, c, o, size, dist = 2, 8, 16, 16, 1.5
    uv_l = jnp.asarray(rng.uniform(-0.9, 0.9, (b, 21, 2)).astype(np.float32))
    uv_r = jnp.asarray(rng.uniform(-0.9, 0.9, (b, 21, 2)).astype(np.float32))
    f_l = jnp.asarray(rng.randn(b, 21, c).astype(np.float32))
    f_r = jnp.asarray(rng.randn(b, 21, c).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 2 * 20 * c, o).astype(np.float32)
                         * 0.1)
    bias = jnp.asarray(rng.randn(o).astype(np.float32))

    got = fused_splat_conv(uv_l, uv_r, f_l, f_r, kernel, bias, size, dist)
    want = _materialized(uv_l, uv_r, f_l, f_r, kernel, bias, size, dist)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4)


def test_fused_splat_conv_gradients_match(rng):
    b, c, o, size, dist = 1, 4, 8, 8, 1.0
    uv_l = jnp.asarray(rng.uniform(-0.8, 0.8, (b, 21, 2)).astype(np.float32))
    uv_r = jnp.asarray(rng.uniform(-0.8, 0.8, (b, 21, 2)).astype(np.float32))
    f_l = jnp.asarray(rng.randn(b, 21, c).astype(np.float32))
    f_r = jnp.asarray(rng.randn(b, 21, c).astype(np.float32))
    kernel = jnp.asarray(rng.randn(3, 3, 2 * 20 * c, o).astype(np.float32)
                         * 0.1)
    bias = jnp.zeros((o,), jnp.float32)

    def loss_fused(f, k):
        return jnp.sum(fused_splat_conv(uv_l, uv_r, f, f_r, k, bias, size,
                                        dist) ** 2)

    def loss_mat(f, k):
        return jnp.sum(_materialized(uv_l, uv_r, f, f_r, k, bias, size,
                                     dist) ** 2)

    gf1, gk1 = jax.grad(loss_fused, argnums=(0, 1))(f_l, kernel)
    gf2, gk2 = jax.grad(loss_mat, argnums=(0, 1))(f_l, kernel)
    np.testing.assert_allclose(np.asarray(gf1), np.asarray(gf2), atol=2e-3)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=2e-3)


def test_splat_weights_shapes(rng):
    uv = jnp.asarray(rng.uniform(-1, 1, (3, 21, 2)).astype(np.float32))
    wa, wb = splat_weights(uv, 16, 1.0)
    assert wa.shape == (3, 16, 16, 20)
    assert np.all(np.asarray(wa) >= 0) and np.all(np.asarray(wa) <= 1)


def test_dir_fused_vs_materialized_same_params(rng):
    """Full DIR forward: factored and materialized splat-conv paths give
    the same outputs from the same parameter tree."""
    import dataclasses
    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR

    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    cfg_f = ModelConfig(backbone_layers=(1, 1, 1, 1), fused_splat_conv=True)
    cfg_m = dataclasses.replace(cfg_f, fused_splat_conv=False)
    img = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32))

    mf, mm = DIR(cfg_f), DIR(cfg_m)
    variables = mf.init(jax.random.PRNGKey(0), img, mano_l, mano_r)
    out_f = mf.apply(variables, img, mano_l, mano_r)
    out_m = mm.apply(variables, img, mano_l, mano_r)

    for k in ("pd_joint_xyz_left", "pd_mesh_xyz_right", "pd_offset"):
        np.testing.assert_allclose(
            np.asarray(out_f["stages"][-1][k]),
            np.asarray(out_m["stages"][-1][k]), atol=2e-4, err_msg=k)
    np.testing.assert_allclose(np.asarray(out_f["seg"]),
                               np.asarray(out_m["seg"]), atol=2e-3)
