"""MANO layer parity tests against an independent slow numpy oracle.

The oracle does sequential forward kinematics over the 16-joint tree with
explicit parent pointers and per-sample skinning in float64 — a completely
different evaluation order from the level-batched jnp implementation.
"""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from dir_tpu.mano import (
    ManoModel, synthetic_mano, fix_left_shapedirs,
    mano_forward_pca6d, mano_forward_rotmat, mano_skin,
    pca_to_axis, axis_to_pca,
    MANO_PARENTS, JOINT_REORDER,
)


def _np_model(model: ManoModel):
    return {k: np.asarray(v, np.float64) for k, v in model._asdict().items()}


def _se3(rot, t):
    m = np.eye(4)
    m[:3, :3] = rot
    m[:3, 3] = t
    return m


def oracle_skin(model, root_rot, local_rots, betas, center_idx):
    """Sequential-FK float64 oracle. Shapes: (B,3,3), (B,15,3,3), (B,10)."""
    m = _np_model(model)
    b = root_rot.shape[0]
    verts_out, joints_out = [], []
    for s in range(b):
        v_shaped = m["v_template"] + m["shapedirs"] @ betas[s]
        j = m["j_regressor"] @ v_shaped  # (16, 3)
        pose_map = (local_rots[s] - np.eye(3)).reshape(135)
        v_posed = v_shaped + m["posedirs"] @ pose_map

        g = [None] * 16
        g[0] = _se3(root_rot[s], j[0])
        for i in range(1, 16):
            p = MANO_PARENTS[i]
            g[i] = g[p] @ _se3(local_rots[s, i - 1], j[i] - j[p])
        joints16 = np.stack([g[i][:3, 3] for i in range(16)])

        a = np.stack([g[i] @ _se3(np.eye(3), -j[i]) for i in range(16)])
        mv = np.einsum("vj,jik->vik", m["weights"], a)  # (778, 4, 4)
        verts = np.einsum("vik,vk->vi", mv[:, :3, :3], v_posed) + mv[:, :3, 3]

        tips = verts[np.asarray(model.tips)]
        joints = np.concatenate([joints16, tips])[list(JOINT_REORDER)]
        if center_idx is not None:
            c = joints[center_idx:center_idx + 1]
            verts = verts - c
            joints = joints - c
        verts_out.append(verts)
        joints_out.append(joints)
    return np.stack(verts_out), np.stack(joints_out)


def test_mano_skin_matches_oracle(rng):
    model = synthetic_mano("right", seed=3)
    b = 4
    root_rot = R.random(b, random_state=1).as_matrix().astype(np.float32)
    local = R.random(b * 15, random_state=2).as_matrix().reshape(
        b, 15, 3, 3).astype(np.float32)
    betas = rng.randn(b, 10).astype(np.float32)

    verts, joints = mano_skin(model, jnp.asarray(root_rot), jnp.asarray(local),
                              jnp.asarray(betas), center_idx=0)
    want_v, want_j = oracle_skin(model, root_rot, local, betas, center_idx=0)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-5)


def test_mano_pca6d_api(rng):
    model = synthetic_mano("left", seed=4)
    b = 3
    pose = rng.randn(b, 51).astype(np.float32) * 0.5
    betas = rng.randn(b, 10).astype(np.float32)
    verts, joints = mano_forward_pca6d(model, jnp.asarray(pose),
                                       jnp.asarray(betas), center_idx=0)
    assert verts.shape == (b, 778, 3)
    assert joints.shape == (b, 21, 3)
    # joint 0 (wrist) is the centering joint
    np.testing.assert_allclose(np.asarray(joints[:, 0]), 0.0, atol=1e-6)

    # Oracle via explicit rotations (robust-6D root + quaternion fingers).
    from dir_tpu.ops.rotation import robust_rot6d_to_rotmat, batch_rodrigues
    axis = np.asarray(pca_to_axis(model, jnp.asarray(pose[:, 6:])))
    local = np.asarray(batch_rodrigues(
        jnp.asarray(axis.reshape(-1, 3)))).reshape(b, 15, 3, 3)
    root = np.asarray(robust_rot6d_to_rotmat(jnp.asarray(pose[:, :6])))
    want_v, want_j = oracle_skin(model, root, local,
                                 betas.astype(np.float64), center_idx=0)
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-5)


def test_mano_rotmat_api_trans_scale(rng):
    model = synthetic_mano("right", seed=5)
    b = 2
    root = R.random(b, random_state=7).as_matrix().astype(np.float32)
    pose = rng.randn(b, 45).astype(np.float32) * 0.3
    shape = rng.randn(b, 10).astype(np.float32)
    trans = rng.randn(b, 3).astype(np.float32)
    scale = rng.rand(b).astype(np.float32) + 0.5

    verts, joints = mano_forward_rotmat(
        model, jnp.asarray(root), jnp.asarray(pose), jnp.asarray(shape),
        trans=jnp.asarray(trans), scale=jnp.asarray(scale), center_idx=9)

    from dir_tpu.ops.rotation import rodrigues
    axis = np.asarray(pca_to_axis(model, jnp.asarray(pose)))
    local = np.asarray(rodrigues(
        jnp.asarray(axis.reshape(-1, 3)))).reshape(b, 15, 3, 3)
    want_v, want_j = oracle_skin(model, root, local,
                                 shape.astype(np.float64), center_idx=9)
    want_v = want_v * scale[:, None, None] + trans[:, None, :]
    want_j = want_j * scale[:, None, None] + trans[:, None, :]
    np.testing.assert_allclose(np.asarray(verts), want_v, atol=2e-5)
    np.testing.assert_allclose(np.asarray(joints), want_j, atol=2e-5)


def test_rest_pose_is_shaped_template(rng):
    model = synthetic_mano("right", seed=6)
    b = 2
    root = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    local = np.tile(np.eye(3, dtype=np.float32), (b, 15, 1, 1))
    betas = rng.randn(b, 10).astype(np.float32)
    verts, _ = mano_skin(model, jnp.asarray(root), jnp.asarray(local),
                         jnp.asarray(betas), center_idx=None)
    want = (np.asarray(model.v_template)
            + np.einsum("vcs,bs->bvc", np.asarray(model.shapedirs), betas))
    np.testing.assert_allclose(np.asarray(verts), want, atol=1e-5)


def test_pca_axis_roundtrip(rng):
    model = synthetic_mano("right", seed=8)
    pca = jnp.asarray(rng.randn(4, 45).astype(np.float32))
    axis = pca_to_axis(model, pca)
    back = axis_to_pca(model, axis)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pca), atol=1e-4)


def test_fix_left_shapedirs():
    right = synthetic_mano("right", seed=9)
    # Fabricate the MANO bug: identical first-row shapedirs across sides.
    left = synthetic_mano("left", seed=10)._replace(shapedirs=right.shapedirs)
    fixed = fix_left_shapedirs(left, right)
    np.testing.assert_allclose(np.asarray(fixed.shapedirs[:, 0, :]),
                               -np.asarray(right.shapedirs[:, 0, :]))
    np.testing.assert_allclose(np.asarray(fixed.shapedirs[:, 1:, :]),
                               np.asarray(right.shapedirs[:, 1:, :]))
    # A genuinely mirrored pair is left untouched.
    mirrored = right._replace(
        shapedirs=right.shapedirs.at[:, 0, :].multiply(-1.0))
    untouched = fix_left_shapedirs(mirrored, right)
    np.testing.assert_allclose(np.asarray(untouched.shapedirs),
                               np.asarray(mirrored.shapedirs))


def test_mano_gradients_finite(rng):
    import jax
    model = synthetic_mano("right", seed=11)
    pose = jnp.asarray(rng.randn(2, 51).astype(np.float32) * 0.1)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))

    def loss(p, b):
        v, j = mano_forward_pca6d(model, p, b, center_idx=0)
        return jnp.sum(v ** 2) + jnp.sum(j ** 2)

    gp, gb = jax.grad(loss, argnums=(0, 1))(pose, betas)
    assert np.all(np.isfinite(np.asarray(gp)))
    assert np.all(np.isfinite(np.asarray(gb)))
    assert float(jnp.max(jnp.abs(gp))) > 0


def test_local_frames_orthonormal(rng):
    from dir_tpu.mano.frames import local_frames
    model = synthetic_mano("right", seed=12)
    betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
    frames = np.asarray(local_frames(model, betas))
    assert frames.shape == (2, 15, 3, 3)
    eye = np.eye(3)
    for f in frames.reshape(-1, 3, 3):
        np.testing.assert_allclose(f @ f.T, eye, atol=1e-4)
        assert np.linalg.det(f) > 0.9


def test_mano_rotmats_proj_api(rng):
    from dir_tpu.mano.layer import mano_forward_rotmats_proj
    model = synthetic_mano("right", seed=13)
    b = 2
    mats = R.random(b * 16, random_state=9).as_matrix().reshape(
        b, 16, 3, 3).astype(np.float32)
    noisy = mats + rng.randn(b, 16, 3, 3).astype(np.float32) * 0.02
    verts, joints = mano_forward_rotmats_proj(
        model, jnp.asarray(noisy), jnp.zeros((b, 10), jnp.float32),
        center_idx=0)
    assert verts.shape == (b, 778, 3)
    # projecting exact rotations == skinning them directly
    v2, j2 = mano_forward_rotmats_proj(
        model, jnp.asarray(mats), jnp.zeros((b, 10), jnp.float32),
        center_idx=0)
    v3, j3 = mano_skin(model, jnp.asarray(mats[:, 0]),
                       jnp.asarray(mats[:, 1:]),
                       jnp.zeros((b, 10), jnp.float32), center_idx=0)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v3), atol=1e-4)
