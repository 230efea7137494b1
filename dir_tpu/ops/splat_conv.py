"""Fused bone-splat + 3x3 fusion convolution (exact factorization).

HLO profiling showed the refinement stages' ``fusion_conv1`` (3x3 conv
over the concatenated 20*64*2-channel splat maps, models/dir.py:57-62)
dominates the whole model's FLOPs (~310 GFLOP at stage 2, batch 64 —
more than the entire ResNet-50 forward) and its gradient kernels top the
train-step profile.

The splat map is rank-1 per bone and endpoint:
    splat[p, (h,k)*C+c] = w_a[p,hk] fa[hk,c] + w_b[p,hk] fb[hk,c]
so conv(splat, W) factors exactly:
    out[q,o] = sum_d sum_j wtil[q+d, j] * G[d, j, o]
    G[d, j, o] = sum_c W[d, block(j), c, o] * ftil[j, c]
with j running over the 80 (hand, endpoint, bone) combinations. The
per-sample precontraction G is tiny; the spatial pass is nine
K=80 batched matmuls — ~13x fewer FLOPs than the dense conv, and the
(B, S, S, 2560) splat map (167 MB at batch 64) never materializes in
either direction. Parameters are the ORIGINAL conv kernel/bias —
checkpoints are interchangeable with the materialized path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dir_tpu.ops.bone_splat import CHILD, PARENT


def splat_weights(joint_uv: jnp.ndarray, size: int, distance: float):
    """Masked interpolation weights of the bone splat.

    joint_uv: (B, 21, 2) in [-1, 1]. Returns (w_a, w_b): (B, S, S, 20)
    in at-least-fp32 (geometry never runs bf16; promotes to fp64 under
    the fp64 gradient oracle — see ops.bone_splat).
    """
    f32 = jnp.promote_types(joint_uv.dtype, jnp.float32)
    parent = jnp.asarray(PARENT)
    child = jnp.asarray(CHILD)

    uv = (joint_uv.astype(f32) + 1.0) / 2.0 * size
    a = uv[:, parent][:, None, :, :]   # (B, 1, 20, 2)
    bb = uv[:, child][:, None, :, :]

    coords = jnp.arange(size, dtype=f32) + 0.5
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    p = jnp.stack([xx, yy], -1).reshape(1, size * size, 1, 2)

    d_ba = bb - a
    seg_len = jnp.hypot(d_ba[..., 0], d_ba[..., 1])[..., None]
    d = d_ba / jnp.where(seg_len > 0, seg_len, 1.0)
    s = jnp.sum((a - p) * d, axis=-1)
    t = jnp.sum((p - bb) * d, axis=-1)
    h = jnp.maximum(jnp.maximum(s, t), 0.0)
    d_pa = p - a
    cross = d_pa[..., 0] * d[..., 1] - d_pa[..., 1] * d[..., 0]
    seg_dist = jnp.hypot(h, cross)
    mask = (seg_dist < distance) & (seg_len[..., 0] > 0)

    dist_a = jnp.linalg.norm(p - a, axis=-1)
    dist_b = jnp.linalg.norm(p - bb, axis=-1)
    denom = dist_a + dist_b
    denom = jnp.where(denom > 0, denom, 1.0)
    w_a = jnp.where(mask, 1.0 - dist_a / denom, 0.0)
    w_b = jnp.where(mask, 1.0 - dist_b / denom, 0.0)
    b = joint_uv.shape[0]
    return (w_a.reshape(b, size, size, 20), w_b.reshape(b, size, size, 20))


def fused_splat_conv(uv_left: jnp.ndarray, uv_right: jnp.ndarray,
                     feat_left: jnp.ndarray, feat_right: jnp.ndarray,
                     kernel: jnp.ndarray, bias: jnp.ndarray,
                     size: int, distance: float) -> jnp.ndarray:
    """conv3x3(concat(splat_l, splat_r), kernel) + bias, factored.

    Args:
        uv_*: (B, 21, 2) joint positions in [-1, 1].
        feat_*: (B, 21, C) per-joint features (the proj_feat_emb output).
        kernel: (3, 3, 2*20*C, O) — the SAME fusion-conv kernel the
            materialized path uses (input channels ordered
            [left | right], bone-major channel-minor).
        bias: (O,).
    Returns:
        (B, S, S, O), numerically equal to the materialized path up to
        reassociation.
    """
    b, _, c = feat_left.shape
    o = kernel.shape[-1]
    dt = feat_left.dtype

    # per-(hand, endpoint, bone) weight maps -> (B, S, S, 80)
    wa_l, wb_l = splat_weights(uv_left, size, distance)
    wa_r, wb_r = splat_weights(uv_right, size, distance)
    wtil = jnp.concatenate([wa_l, wb_l, wa_r, wb_r], axis=-1).astype(dt)

    # endpoint features, matching j-order of wtil: (B, 80, C)
    parent = jnp.asarray(PARENT)
    child = jnp.asarray(CHILD)
    ftil = jnp.concatenate([
        feat_left[:, parent], feat_left[:, child],
        feat_right[:, parent], feat_right[:, child]], axis=1)

    # kernel blocks per j: both endpoints of bone k (hand h) hit the same
    # input-channel block -> (3, 3, 80, C, O) with the a/b duplication
    kr = kernel.reshape(3, 3, 2, 20, c, o)
    kh = jnp.concatenate([kr[:, :, 0], kr[:, :, 0],
                          kr[:, :, 1], kr[:, :, 1]], axis=2)  # (3,3,80,C,O)

    # per-sample precontraction: G (B, 3, 3, 80, O)
    g = jnp.einsum("xyjco,bjc->bxyjo", kh, ftil.astype(kh.dtype))

    # spatial pass (SAME padding): the nine shifted windows concatenate
    # channel-wise into ONE K=720 batched matmul — measured faster than
    # nine K=80 matmuls fwd+bwd (K=80 pads to a 128 MXU tile; the
    # gradient matmuls inherit the fat K too).
    pad = jnp.pad(wtil, ((0, 0), (1, 1), (1, 1), (0, 0)))
    wins = [pad[:, dy:dy + size, dx:dx + size]
            for dy in range(3) for dx in range(3)]
    wun = jnp.concatenate(wins, axis=-1).reshape(b, size * size, 9 * 80)
    out = jnp.einsum("bpk,bko->bpo", wun, g.reshape(b, 9 * 80, o))
    return out.reshape(b, size, size, o) + bias.astype(g.dtype)
