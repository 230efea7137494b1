"""End-to-end DIR model tests (tiny backbone for CPU speed)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full-model CPU compiles, ~4 min

from dir_tpu.config import ModelConfig
from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
from dir_tpu.models.dir import DIR
from dir_tpu.models.losses import dir_losses, total_loss

CFG = ModelConfig(backbone_layers=(1, 1, 1, 1))


@pytest.fixture(scope="module")
def setup():
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(CFG)
    img = jnp.zeros((2, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, mano_l, mano_r)
    return model, variables, mano_l, mano_r


def _targets(rng, b=2):
    return {
        "joint_2d_left": jnp.asarray(rng.randn(b, 21, 3).astype(np.float32)),
        "joint_2d_right": jnp.asarray(rng.randn(b, 21, 3).astype(np.float32)),
        "mesh_2d_left": jnp.asarray(rng.randn(b, 778, 3).astype(np.float32)),
        "mesh_2d_right": jnp.asarray(rng.randn(b, 778, 3).astype(np.float32)),
        "joint_3d_left": jnp.asarray(
            rng.randn(b, 21, 3).astype(np.float32) * 0.1),
        "joint_3d_right": jnp.asarray(
            rng.randn(b, 21, 3).astype(np.float32) * 0.1),
        "mesh_3d_left": jnp.asarray(
            rng.randn(b, 778, 3).astype(np.float32) * 0.1),
        "mesh_3d_right": jnp.asarray(
            rng.randn(b, 778, 3).astype(np.float32) * 0.1),
        "center_left": jnp.asarray(
            rng.randn(b, 1, 3).astype(np.float32) * 0.1),
        "center_right": jnp.asarray(
            rng.randn(b, 1, 3).astype(np.float32) * 0.1),
        "seg": jnp.asarray(rng.randint(0, 3, size=(b, 256, 256))),
        "dense": jnp.asarray(
            rng.rand(b, 256, 256, 3).astype(np.float32)),
    }


def test_forward_shapes(setup, rng):
    model, variables, mano_l, mano_r = setup
    img = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
    out = model.apply(variables, img, mano_l, mano_r)
    assert len(out["stages"]) == 3
    for s in out["stages"]:
        assert s["pd_joint_xyz_left"].shape == (2, 21, 3)
        assert s["pd_mesh_xyz_right"].shape == (2, 778, 3)
        assert s["pd_joint_uv_left"].shape == (2, 21, 2)
        assert s["pd_mesh_uv_right"].shape == (2, 778, 2)
        assert s["pd_offset"].shape == (2, 3)
        assert s["pd_mano_para_left"].shape == (2, 64)
    assert out["seg"].shape == (2, 32, 32, 3)
    assert out["dense"].shape == (2, 32, 32, 3)
    # root-centered MANO: wrist at origin for every stage
    np.testing.assert_allclose(
        np.asarray(out["stages"][0]["pd_joint_xyz_left"][:, 0]), 0, atol=1e-6)


def test_losses_finite_and_complete(setup, rng):
    model, variables, mano_l, mano_r = setup
    img = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
    out = model.apply(variables, img, mano_l, mano_r)
    loss = dir_losses(out, _targets(rng), CFG, mano_l.faces, mano_r.faces)
    # 3 head losses + 13 per-stage losses x 3 stages (4 uv + 4 xyz +
    # 2 edge + 2 normal + 1 offset)
    assert len(loss) == 3 + 13 * 3
    for k, v in loss.items():
        assert np.isfinite(float(v)), k
    assert np.isfinite(float(total_loss(loss)))


def test_train_gradients(setup, rng):
    model, variables, mano_l, mano_r = setup
    img = jnp.asarray(rng.randn(2, 256, 256, 3).astype(np.float32))
    targets = _targets(rng)

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            img, mano_l, mano_r, train=True, mutable=["batch_stats"])
        return total_loss(
            dir_losses(out, targets, CFG, mano_l.faces, mano_r.faces))

    grads = jax.grad(loss_fn)(variables["params"])
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # gradient reaches the backbone and both refinement stages
    gnorm = jax.tree.map(lambda g: float(jnp.sum(jnp.abs(g))), grads)
    assert gnorm["backbone"]["conv1"]["kernel"] > 0
    assert gnorm["decoder"]["projecter_4"]["regressor"]["mano_left"]["kernel"] > 0
    assert gnorm["decoder"]["projecter_3"]["interaction"]["block1"]["attn"][
        "qkv"]["kernel"] > 0
