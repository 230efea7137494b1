"""Camera / projection ops.

Orthographic projection matches utils/utils.py:47-63; the perspective
uvd<->xyz family matches utils/utils.py:164-213. Pure jnp, batch-first.
"""

from __future__ import annotations

import jax.numpy as jnp


def ortho_project(scale: jnp.ndarray, trans2d: jnp.ndarray,
                  points3d: jnp.ndarray) -> jnp.ndarray:
    """Weak-perspective projection (utils/utils.py:47-63).

    Args:
        scale: (B,) per-sample scale.
        trans2d: (B, 2) per-sample 2D translation.
        points3d: (B, N, 3).
    Returns:
        (B, N, 2) = scale * xy + trans2d, in the same normalized units as
        the inputs (the network works in [-1, 1] image coordinates).
    """
    return scale[:, None, None] * points3d[..., :2] + trans2d[:, None, :]


def _cam_params(camera: jnp.ndarray):
    fx = camera[..., 0:1, 0:1]
    fy = camera[..., 1:2, 1:2]
    fu = camera[..., 0:1, 2:3]
    fv = camera[..., 1:2, 2:3]
    return fx, fy, fu, fv


def uvd_to_xyz(uvd: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Pixel (u, v, depth) -> camera xyz (utils/utils.py:164-169).

    camera: (..., 3, 3) intrinsics; uvd: (..., N, 3).
    """
    fx, fy, fu, fv = _cam_params(camera)
    x = (uvd[..., 0:1] - fu) * uvd[..., 2:3] / fx
    y = (uvd[..., 1:2] - fv) * uvd[..., 2:3] / fy
    return jnp.concatenate([x, y, uvd[..., 2:3]], axis=-1)


def xyz_to_uv(xyz: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Camera xyz -> pixel (u, v) (utils/utils.py:173-177)."""
    fx, fy, fu, fv = _cam_params(camera)
    u = xyz[..., 0:1] * fx / (xyz[..., 2:3] + 1e-8) + fu
    v = xyz[..., 1:2] * fy / (xyz[..., 2:3] + 1e-8) + fv
    return jnp.concatenate([u, v], axis=-1)


def xyz_to_uvd(xyz: jnp.ndarray, camera: jnp.ndarray) -> jnp.ndarray:
    """Camera xyz -> pixel (u, v, depth) (utils/utils.py:179-184)."""
    uv = xyz_to_uv(xyz, camera)
    return jnp.concatenate([uv, xyz[..., 2:3]], axis=-1)
