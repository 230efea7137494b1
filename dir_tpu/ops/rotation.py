"""Rotation representations: quaternion, axis-angle, 6D, rotation matrices.

Numerics intentionally match the reference implementations so that model
outputs are bit-compatible at fp32 tolerance:
  - quaternion Rodrigues:   manopth/manopth/rodrigues_layer.py:15-54
  - 6D -> SO(3) (plain/robust): manopth/manopth/rot6d.py:4-51
  - Gram-Schmidt 6D (data-side MANO): models/manolayer.py:20-29
  - classic Rodrigues (data-side MANO): models/manolayer.py:32-48
  - rotmat -> axis-angle: models/manolayer.py:188-216

All functions are pure jnp, batch-first, fp32.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """(B, 4) wxyz quaternion (unnormalized) -> (B, 3, 3) rotation matrix."""
    norm = jnp.linalg.norm(quat, axis=1, keepdims=True)
    q = quat / norm
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    )
    return rot.reshape(-1, 3, 3)


def batch_rodrigues(axisang: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) axis-angle -> (N, 3, 3) rotation via the quaternion path.

    Quirk preserved for parity: the angle is the norm of ``axisang + 1e-8``
    (the epsilon is added to the *vector*, not the norm) while the axis is
    the raw vector divided by that angle (rodrigues_layer.py:41-44).
    """
    angle = jnp.linalg.norm(axisang + 1e-8, axis=1, keepdims=True)
    axis = axisang / angle
    half = angle * 0.5
    quat = jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=1)
    return quat_to_rotmat(quat)


def rodrigues(axis: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) axis-angle -> (N, 3, 3) via the classic Rodrigues formula.

    Matches the data-side MANO implementation (models/manolayer.py:32-48):
    angle = ||axis|| + 1e-8 (epsilon on the norm here).
    """
    angle = jnp.linalg.norm(axis, axis=1, keepdims=True) + 1e-8
    ax = axis / angle
    sin = jnp.sin(angle)[..., None]
    cos = jnp.cos(angle)[..., None]
    zeros = jnp.zeros_like(ax[:, 0])
    # Skew-symmetric cross-product matrix K with K v = ax x v.
    k = jnp.stack(
        [
            zeros, -ax[:, 2], ax[:, 1],
            ax[:, 2], zeros, -ax[:, 0],
            -ax[:, 1], ax[:, 0], zeros,
        ],
        axis=1,
    ).reshape(-1, 3, 3)
    eye = jnp.eye(3, dtype=axis.dtype)
    # K^2 = a a^T - I for a unit axis: exact, and avoids a low-precision
    # 3x3 matmul (TPU default matmul precision is reduced).
    kk = ax[:, :, None] * ax[:, None, :] - eye
    return eye + sin * k + (1.0 - cos) * kk


def _normalize_rows(v: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Row-normalize with magnitude clamped to at least eps (rot6d.py:55-61).

    The clamp sits INSIDE the sqrt: ``sqrt(max(s, eps^2))`` equals the
    reference's ``max(sqrt(s), eps)`` exactly (sqrt is monotone), but
    its VJP is finite at s == 0 — ``max`` after the sqrt multiplies the
    sqrt's infinite derivative by a zero cotangent and emits NaN. The
    robust-6D path hits s == 0 for real inputs (x - y with the two
    normalized directions equal in fp32), and one NaN there poisons
    every backbone gradient upstream."""
    sq = jnp.sum(v * v, axis=1, keepdims=True)
    mag = jnp.sqrt(jnp.maximum(sq, eps * eps))
    return v / mag


def rot6d_to_rotmat(poses: jnp.ndarray) -> jnp.ndarray:
    """(B, 6) -> (B, 3, 3), Zhou et al. CVPR'19 plain variant (rot6d.py:4-24)."""
    x_raw, y_raw = poses[:, 0:3], poses[:, 3:6]
    x = _normalize_rows(x_raw)
    z = _normalize_rows(jnp.cross(x, y_raw))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=2)


def robust_rot6d_to_rotmat(poses: jnp.ndarray) -> jnp.ndarray:
    """(B, 6) -> (B, 3, 3), symmetric variant that treats both predicted
    directions equally (rot6d.py:26-51). Used by the in-network MANO layer
    (models/dir.py:221-224 sets robust_rot=True)."""
    x = _normalize_rows(poses[:, 0:3])
    y = _normalize_rows(poses[:, 3:6])
    middle = _normalize_rows(x + y)
    orthmid = _normalize_rows(x - y)
    x2 = _normalize_rows(middle + orthmid)
    y2 = _normalize_rows(middle - orthmid)
    z = _normalize_rows(jnp.cross(x2, y2))
    return jnp.stack([x2, y2, z], axis=2)


def rot6d_to_rotmat_gs(vec: jnp.ndarray) -> jnp.ndarray:
    """(B, 6) -> (B, 3, 3) Gram-Schmidt variant used by the data-side MANO
    (models/manolayer.py:20-29): epsilon added to the norm denominators."""
    x = vec[:, 0:3]
    y = vec[:, 3:6]
    x = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-8)
    y = y - jnp.sum(x * y, axis=1, keepdims=True) * x
    y = y / (jnp.linalg.norm(y, axis=1, keepdims=True) + 1e-8)
    z = jnp.cross(x, y)
    return jnp.stack([x, y, z], axis=2)


def rotmat_to_axis_angle(rot: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) -> (N, 3) axis-angle (models/manolayer.py:188-216).

    Reconstructs sin from the skew part and cos from the symmetric part,
    then resolves the quadrant. Branchless (jnp.where) under jit.
    """
    rot = rot.reshape(-1, 3, 3)
    skew = (rot - jnp.swapaxes(rot, 1, 2)) / 2.0
    # L = (skew[2,1], skew[0,2], skew[1,0]) = sin(theta) * axis
    ell = jnp.stack([skew[:, 2, 1], skew[:, 0, 2], skew[:, 1, 0]], axis=1)
    sin = jnp.linalg.norm(ell, axis=1)
    axis = ell / (sin[:, None] + 1e-8)

    sym = (rot + jnp.swapaxes(rot, 1, 2)) / 2.0 - jnp.eye(3, dtype=rot.dtype)
    outer = axis[:, :, None] * axis[:, None, :] - jnp.eye(3, dtype=rot.dtype)
    tr_sym = sym[:, 0, 0] + sym[:, 1, 1] + sym[:, 2, 2]
    tr_outer = outer[:, 0, 0] + outer[:, 1, 1] + outer[:, 2, 2]
    cos = 1.0 - tr_sym / (tr_outer + 1e-8)

    sin_c = jnp.clip(sin, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arcsin(sin_c)
    theta = jnp.where((cos < 0) & (sin > 0), 3.14159 - theta, theta)
    theta = jnp.where((cos < 0) & (sin < 0), -3.14159 - theta, theta)
    return theta[:, None] * axis


def rotation_project(mats: jnp.ndarray) -> jnp.ndarray:
    """Project arbitrary (..., 3, 3) matrices to the closest rotations
    via SVD (manopth/manopth/rotproj.py:4-21, used for
    joint_rot_mode='rotmat').

    The reference loops a CPU SVD per matrix; this is a batched
    jnp.linalg.svd with the determinant sign fix applied to the last
    column of U.
    """
    u, _, vt = jnp.linalg.svd(mats)
    rot = u @ vt
    det = jnp.linalg.det(rot)
    u_fix = u.at[..., :, 2].multiply(jnp.sign(det)[..., None])
    return u_fix @ vt


def subtract_flat_id(rot_mats: jnp.ndarray) -> jnp.ndarray:
    """(B, K*9) flattened rotmats minus flattened identities
    (manopth/manopth/tensutils.py:36-44)."""
    k = rot_mats.shape[1] // 9
    eye = jnp.tile(jnp.eye(3, dtype=rot_mats.dtype).reshape(1, 9), (1, k))
    return rot_mats - eye


def posemap_axisang(pose_vectors: jnp.ndarray):
    """(B, K*3) axis-angle stack -> (pose_map (B, K*9), rot_mats (B, K*9)).

    pose_map is the flattened (R - I) blend-shape driver
    (manopth/manopth/tensutils.py:6-13).
    """
    b = pose_vectors.shape[0]
    rots = batch_rodrigues(pose_vectors.reshape(-1, 3)).reshape(b, -1)
    return subtract_flat_id(rots), rots
