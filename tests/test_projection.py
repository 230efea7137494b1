"""Tests for camera / projection ops."""

import numpy as np
import jax.numpy as jnp

from dir_tpu.ops import projection


def _camera():
    cam = np.array([[600.0, 0, 128.0], [0, 610.0, 130.0], [0, 0, 1.0]],
                   dtype=np.float32)
    return cam


def test_ortho_project(rng):
    scale = rng.rand(4).astype(np.float32)
    trans = rng.randn(4, 2).astype(np.float32)
    pts = rng.randn(4, 21, 3).astype(np.float32)
    got = np.asarray(projection.ortho_project(
        jnp.asarray(scale), jnp.asarray(trans), jnp.asarray(pts)))
    want = scale[:, None, None] * pts[:, :, :2] + trans[:, None, :]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_uvd_xyz_roundtrip(rng):
    cam = jnp.asarray(np.tile(_camera(), (4, 1, 1)))
    xyz = rng.randn(4, 21, 3).astype(np.float32)
    xyz[..., 2] += 5.0  # keep in front of the camera
    uvd = projection.xyz_to_uvd(jnp.asarray(xyz), cam)
    back = np.asarray(projection.uvd_to_xyz(uvd, cam))
    np.testing.assert_allclose(back, xyz, atol=1e-4)


def test_xyz_to_uv_matches_matrix_projection(rng):
    cam_np = _camera()
    cam = jnp.asarray(np.tile(cam_np, (2, 1, 1)))
    xyz = rng.randn(2, 10, 3).astype(np.float32)
    xyz[..., 2] += 4.0
    got = np.asarray(projection.xyz_to_uv(jnp.asarray(xyz), cam))
    proj = xyz @ cam_np.T
    want = proj[..., :2] / proj[..., 2:]
    np.testing.assert_allclose(got, want, atol=1e-3)
