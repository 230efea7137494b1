"""Golden tests for rotation ops against scipy and algebraic identities."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as R

from dir_tpu.ops import rotation


def _assert_rotation(mats, atol=1e-5):
    mats = np.asarray(mats)
    eye = np.eye(3)
    for m in mats.reshape(-1, 3, 3):
        np.testing.assert_allclose(m @ m.T, eye, atol=atol)
        assert np.linalg.det(m) > 0.9


def test_batch_rodrigues_matches_scipy(rng):
    v = rng.randn(32, 3).astype(np.float32)
    got = np.asarray(rotation.batch_rodrigues(jnp.asarray(v)))
    want = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rodrigues_matches_scipy(rng):
    v = rng.randn(32, 3).astype(np.float32) * 2.0
    got = np.asarray(rotation.rodrigues(jnp.asarray(v)))
    want = R.from_rotvec(v).as_matrix()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_rodrigues_zero_vector_is_identity():
    v = jnp.zeros((2, 3), jnp.float32)
    for fn in (rotation.rodrigues, rotation.batch_rodrigues):
        got = np.asarray(fn(v))
        np.testing.assert_allclose(got, np.eye(3)[None].repeat(2, 0), atol=1e-4)


def test_rot6d_valid_rotations(rng):
    p = rng.randn(64, 6).astype(np.float32)
    _assert_rotation(rotation.rot6d_to_rotmat(jnp.asarray(p)))
    _assert_rotation(rotation.robust_rot6d_to_rotmat(jnp.asarray(p)))
    _assert_rotation(rotation.rot6d_to_rotmat_gs(jnp.asarray(p)))


def test_rot6d_recovers_exact_rotation(rng):
    """Feeding the first two columns of a rotation back must reproduce it."""
    mats = R.random(16, random_state=0).as_matrix().astype(np.float32)
    six = mats[:, :, :2].transpose(0, 2, 1).reshape(16, 6)  # columns x, y
    for fn in (rotation.rot6d_to_rotmat, rotation.robust_rot6d_to_rotmat,
               rotation.rot6d_to_rotmat_gs):
        got = np.asarray(fn(jnp.asarray(six)))
        np.testing.assert_allclose(got, mats, atol=1e-4)


def test_rotmat_to_axis_angle_roundtrip(rng):
    # Angles away from 0 and pi where the formula is well-conditioned.
    angles = rng.uniform(0.2, 2.6, size=24).astype(np.float32)
    axes = rng.randn(24, 3).astype(np.float32)
    axes /= np.linalg.norm(axes, axis=1, keepdims=True)
    rotvec = axes * angles[:, None]
    mats = R.from_rotvec(rotvec).as_matrix().astype(np.float32)
    got = np.asarray(rotation.rotmat_to_axis_angle(jnp.asarray(mats)))
    np.testing.assert_allclose(got, rotvec, atol=2e-3)


def test_posemap_axisang_shapes_and_identity(rng):
    pose = jnp.asarray(rng.randn(4, 45).astype(np.float32))
    pose_map, rot_mats = rotation.posemap_axisang(pose)
    assert pose_map.shape == (4, 135)
    assert rot_mats.shape == (4, 135)
    # pose_map == rot_mats - I for each 3x3 block
    eye = np.tile(np.eye(3).reshape(9), 15)
    np.testing.assert_allclose(
        np.asarray(pose_map), np.asarray(rot_mats) - eye, atol=1e-6)


def test_quat_to_rotmat_matches_scipy(rng):
    q = rng.randn(16, 4).astype(np.float32)
    got = np.asarray(rotation.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses xyzw ordering
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    want = R.from_quat(np.concatenate([qn[:, 1:], qn[:, :1]], 1)).as_matrix()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rotation_project(rng):
    from dir_tpu.ops.rotation import rotation_project
    # noisy rotations project back to valid rotations
    base = R.random(8, random_state=3).as_matrix().astype(np.float32)
    noisy = base + rng.randn(8, 3, 3).astype(np.float32) * 0.05
    proj = np.asarray(rotation_project(jnp.asarray(noisy)))
    _assert_rotation(proj, atol=1e-4)
    # an exact rotation is a fixed point
    np.testing.assert_allclose(
        np.asarray(rotation_project(jnp.asarray(base))), base, atol=1e-5)
    # a reflection-ish matrix still maps to det +1
    refl = base.copy()
    refl[:, :, 2] *= -1
    proj2 = np.asarray(rotation_project(jnp.asarray(refl)))
    _assert_rotation(proj2, atol=1e-4)


def test_6d_gradients_finite_at_degenerate_inputs():
    """Exactly-degenerate 6D inputs must yield finite gradients: the
    robust variant hits x - y == 0 when both directions coincide, the
    plain variant cross(x, y) == 0 when they are parallel. A NaN here
    poisons every upstream gradient (found via the DP-equivalence
    test: clamp-after-sqrt normalization has a 0 * inf VJP)."""
    import jax

    from dir_tpu.ops.rotation import (robust_rot6d_to_rotmat,
                                      rot6d_to_rotmat)

    degenerate = jnp.asarray([
        [1.0, 0.0, 0.0, 1.0, 0.0, 0.0],    # x == y
        [0.5, 0.5, 0.0, -0.5, -0.5, 0.0],  # x == -y
        [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],    # all-zero
        [0.3, -0.2, 0.9, 0.1, 0.4, -0.5],  # generic (control)
    ])
    for fn in (robust_rot6d_to_rotmat, rot6d_to_rotmat):
        val = fn(degenerate)
        assert bool(jnp.all(jnp.isfinite(val))), fn.__name__
        grad = jax.grad(lambda p: jnp.sum(fn(p) ** 2))(degenerate)
        assert bool(jnp.all(jnp.isfinite(grad))), fn.__name__
