"""Bone-feature splatting: project per-joint features back to image space
along skeleton bones.

Reimplements the reference's ``bone_proj``/``lineseg_dists``
(models/dir.py:132-174): for every pixel center and every one of the 20
hand bones, compute the point-to-segment distance; pixels within a
threshold receive the bone's endpoint features, linearly interpolated by
relative distance to the two endpoints.

This is the prime fusion candidate on TPU (the reference materializes a
B x S^2 x 20 distance tensor); a Pallas kernel backs the same interface in
``dir_tpu.ops.pallas.bone_splat_pallas``. This file is the reference jnp
implementation — XLA already fuses the elementwise chain into the output
write, so it is close to memory-bound speed-of-light for the jnp path.
"""

from __future__ import annotations

import jax.numpy as jnp

# 21-joint hand skeleton: bone k connects PARENT[k] -> CHILD[k]
# (models/dir.py:25-26).
PARENT = (0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19)
CHILD = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20)


def _pixel_grid(size: int, dtype) -> jnp.ndarray:
    """(S*S, 2) pixel-center coordinates (x, y), row-major over y
    (models/dir.py:66-70)."""
    coords = jnp.arange(size, dtype=dtype) + 0.5
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    return jnp.stack([xx, yy], axis=-1).reshape(size * size, 2)


def bone_splat(joint_uv: jnp.ndarray, joint_feat: jnp.ndarray,
               size: int, distance: float) -> jnp.ndarray:
    """Splat joint features along bones into an image-space feature map.

    Args:
        joint_uv: (B, 21, 2) joint positions in [-1, 1] image coordinates.
        joint_feat: (B, 21, C) per-joint features.
        size: output feature map side length S.
        distance: pixel-distance threshold for a pixel to receive a bone.
    Returns:
        (B, S, S, 20*C) NHWC feature map; last dim is bone-major,
        channel-minor — matching the reference's channel ordering so the
        downstream fusion conv maps 1:1 to the torch checkpoint.
    """
    # Geometry (distances/weights) in AT LEAST fp32 (never the bf16
    # feature dtype); promote keeps it fp64 under the fp64 gradient
    # oracle (tests/test_reference_oracle_grad.py).
    dtype = jnp.promote_types(joint_uv.dtype, jnp.float32)
    feat_dtype = joint_feat.dtype
    b = joint_uv.shape[0]
    c = joint_feat.shape[-1]
    parent = jnp.asarray(PARENT)
    child = jnp.asarray(CHILD)

    uv = (joint_uv.astype(dtype) + 1.0) / 2.0 * size
    a = uv[:, parent]  # (B, 20, 2) bone start
    bb = uv[:, child]  # (B, 20, 2) bone end
    p = _pixel_grid(size, dtype)[None, :, None, :]  # (1, S^2, 1, 2)
    a = a[:, None]  # (B, 1, 20, 2)
    bb = bb[:, None]

    # Point-to-segment distance (models/dir.py:132-144). The direction is
    # guarded against zero-length bones (the reference NaNs there and the
    # mask then drops the bone; we instead fall back cleanly, which only
    # differs on the measure-zero a == b set).
    d_ba = bb - a
    seg_len = jnp.hypot(d_ba[..., 0], d_ba[..., 1])[..., None]
    d = d_ba / jnp.where(seg_len > 0, seg_len, 1.0)
    s = jnp.sum((a - p) * d, axis=-1)
    t = jnp.sum((p - bb) * d, axis=-1)
    h = jnp.maximum(jnp.maximum(s, t), 0.0)
    d_pa = p - a
    cross = d_pa[..., 0] * d[..., 1] - d_pa[..., 1] * d[..., 0]
    seg_dist = jnp.hypot(h, cross)  # (B, S^2, 20)
    mask = (seg_dist < distance) & (seg_len[..., 0] > 0)

    # Endpoint-distance interpolation weights (models/dir.py:164-168).
    dist_a = jnp.linalg.norm(p - a, axis=-1)
    dist_b = jnp.linalg.norm(p - bb, axis=-1)
    denom = dist_a + dist_b
    denom = jnp.where(denom > 0, denom, 1.0)
    w_a = 1.0 - dist_a / denom
    w_b = 1.0 - dist_b / denom

    # Fold the per-bone feature interpolation into a block-diagonal
    # selector matmul: out[:, p, k*C+i] = wa[:, p, k] fa[:, k, i] + ...
    # This runs on the MXU instead of materializing a broadcast
    # (B, S^2, 20, C) select — ~40x faster at batch 64 / S=32 on TPU.
    w_a = jnp.where(mask, w_a, 0.0).astype(feat_dtype)
    w_b = jnp.where(mask, w_b, 0.0).astype(feat_dtype)
    sel = _selector(c, feat_dtype)                       # (20, 20C)
    # (B, 20, 20C): row k carries fa[b, k] in its diagonal block
    fa_flat = joint_feat[:, parent].reshape(b, 1, 20 * c)
    fb_flat = joint_feat[:, child].reshape(b, 1, 20 * c)
    m_a = sel[None] * fa_flat
    m_b = sel[None] * fb_flat
    out = (jnp.einsum("bpk,bkd->bpd", w_a, m_a)
           + jnp.einsum("bpk,bkd->bpd", w_b, m_b))
    return out.astype(feat_dtype).reshape(b, size, size, 20 * c)


def _selector(c: int, dtype) -> jnp.ndarray:
    """(20, 20C) 0/1 block-diagonal: row k selects columns k*C..(k+1)*C."""
    import numpy as np
    sel = np.zeros((20, 20 * c), np.float32)
    for k in range(20):
        sel[k, k * c:(k + 1) * c] = 1.0
    return jnp.asarray(sel, dtype)
