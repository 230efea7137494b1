"""Tests for the bone-splat op against a brute-force numpy oracle."""

import numpy as np
import jax.numpy as jnp

from dir_tpu.ops.bone_splat import bone_splat, PARENT, CHILD


def _segment_distance(p, a, b):
    """Exact point-to-segment distance."""
    ab = b - a
    denom = np.dot(ab, ab)
    if denom == 0:
        return np.linalg.norm(p - a)
    t = np.clip(np.dot(p - a, ab) / denom, 0.0, 1.0)
    proj = a + t * ab
    return np.linalg.norm(p - proj)


def _oracle(joint_uv, joint_feat, size, distance):
    b, j, c = joint_feat.shape
    uv = (joint_uv + 1.0) / 2.0 * size
    out = np.zeros((b, size, size, 20 * c), np.float32)
    for bi in range(b):
        for yi in range(size):
            for xi in range(size):
                p = np.array([xi + 0.5, yi + 0.5])
                for k in range(20):
                    a = uv[bi, PARENT[k]]
                    bb = uv[bi, CHILD[k]]
                    if np.allclose(a, bb):
                        continue
                    if _segment_distance(p, a, bb) >= distance:
                        continue
                    da = np.linalg.norm(p - a)
                    db = np.linalg.norm(p - bb)
                    wa = 1.0 - da / (da + db)
                    wb = 1.0 - db / (da + db)
                    feat = wa * joint_feat[bi, PARENT[k]] + wb * joint_feat[bi, CHILD[k]]
                    out[bi, yi, xi, k * c:(k + 1) * c] = feat
    return out


def test_bone_splat_matches_oracle(rng):
    b, size, c = 2, 8, 3
    joint_uv = rng.uniform(-0.9, 0.9, size=(b, 21, 2)).astype(np.float32)
    joint_feat = rng.randn(b, 21, c).astype(np.float32)
    got = np.asarray(bone_splat(jnp.asarray(joint_uv), jnp.asarray(joint_feat),
                                size, 1.5))
    want = _oracle(joint_uv, joint_feat, size, 1.5)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_bone_splat_shapes_and_grad():
    import jax
    joint_uv = jnp.zeros((1, 21, 2), jnp.float32)
    joint_feat = jnp.ones((1, 21, 4), jnp.float32)

    def f(feat):
        return jnp.sum(bone_splat(joint_uv, feat, 16, 1.0))

    g = jax.grad(f)(joint_feat)
    assert g.shape == (1, 21, 4)
    assert np.all(np.isfinite(np.asarray(g)))


def test_bone_splat_degenerate_bone_no_nan():
    """All joints coincident: every bone degenerate -> output zero, finite."""
    joint_uv = jnp.zeros((1, 21, 2), jnp.float32)
    joint_feat = jnp.ones((1, 21, 2), jnp.float32)
    out = np.asarray(bone_splat(joint_uv, joint_feat, 8, 1.0))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, 0.0)
