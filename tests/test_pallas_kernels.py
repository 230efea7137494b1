"""Pallas kernel parity vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dir_tpu.ops.bone_splat import bone_splat
from dir_tpu.ops import pallas_bone_splat as pbs


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    """Run Pallas kernels in interpreter mode on CPU."""
    from jax.experimental.pallas import tpu as pltpu
    ctx = pltpu.force_tpu_interpret_mode()
    ctx.__enter__()
    yield
    ctx.__exit__(None, None, None)


def test_pallas_bone_splat_matches_reference(rng):
    b, c, size, dist = 2, 64, 16, 1.0
    joint_uv = jnp.asarray(
        rng.uniform(-0.9, 0.9, size=(b, 21, 2)).astype(np.float32))
    joint_feat = jnp.asarray(rng.randn(b, 21, c).astype(np.float32))
    got = pbs.bone_splat_pallas(joint_uv, joint_feat, size, dist)
    want = bone_splat(joint_uv, joint_feat, size, dist)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pallas_bone_splat_grad_matches(rng):
    b, c, size, dist = 1, 8, 8, 1.5
    joint_uv = jnp.asarray(
        rng.uniform(-0.8, 0.8, size=(b, 21, 2)).astype(np.float32))
    joint_feat = jnp.asarray(rng.randn(b, 21, c).astype(np.float32))

    def f_pallas(uv, feat):
        return jnp.sum(pbs.bone_splat_pallas(uv, feat, size, dist) ** 2)

    def f_ref(uv, feat):
        return jnp.sum(bone_splat(uv, feat, size, dist) ** 2)

    g_p = jax.grad(f_pallas, argnums=(0, 1))(joint_uv, joint_feat)
    g_r = jax.grad(f_ref, argnums=(0, 1))(joint_uv, joint_feat)
    for a, b_ in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3)
