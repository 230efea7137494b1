"""Point sampling from feature maps (torch ``F.grid_sample`` semantics).

The reference samples per-joint image features with
``F.grid_sample(img_feature, joint_uv.unsqueeze(1))`` (models/dir.py:198)
using torch defaults: bilinear, ``padding_mode='zeros'``,
``align_corners=False``. This reimplements exactly those semantics for a
set of points (we never need a full dense grid), NHWC, gather-based —
21 points per hand per image, so gathers are trivially cheap on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_nhwc(features: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear point sampling with torch align_corners=False semantics.

    Args:
        features: (B, H, W, C) feature maps.
        coords: (B, N, 2) normalized coordinates in [-1, 1]; coords[..., 0]
            indexes width (x/u), coords[..., 1] indexes height (y/v) — the
            torch grid_sample convention.
    Returns:
        (B, N, C) sampled features; out-of-bounds taps contribute zero.
    """
    b, h, w, c = features.shape
    x = (coords[..., 0] + 1.0) * w / 2.0 - 0.5
    y = (coords[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    def tap(xi, yi, wgt):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = features.reshape(b, h * w, c)
        idx = yc * w + xc  # (B, N)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return vals * (wgt * inside.astype(features.dtype))[..., None]

    out = (
        tap(x0, y0, wx0 * wy0)
        + tap(x1, y0, wx1 * wy0)
        + tap(x0, y1, wx0 * wy1)
        + tap(x1, y1, wx1 * wy1)
    )
    return out


def grid_sample_nhwc_mm(features: jnp.ndarray,
                        coords: jnp.ndarray) -> jnp.ndarray:
    """Same semantics as :func:`grid_sample_nhwc`, but the bilinear
    interpolation is ONE selection-matrix matmul instead of gathers.

    The four taps' weighted one-hot rows sum into a single (B, N, H*W)
    interpolation matrix, so sampling is one einsum: the gather's
    backward is a TPU scatter-add into the (B, H, W, C) feature map,
    while the matmul keeps both directions on the MXU (the gather even
    measures slower than this FORWARD at eval batch sizes). The sampling
    coordinates are always detached upstream (reference dir.py:198), so
    no gradient flows through the selection matrix itself. For a few
    dozen points per image the extra FLOPs are negligible.
    """
    b, h, w, c = features.shape
    x = (coords[..., 0] + 1.0) * w / 2.0 - 0.5
    y = (coords[..., 1] + 1.0) * h / 2.0 - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wx0 = 1.0 - wx1
    wy1 = y - y0
    wy0 = 1.0 - wy1

    flat = features.reshape(b, h * w, c)

    def sel_tap(xi, yi, wgt):
        inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        sel = jax.nn.one_hot(yc * w + xc, h * w, dtype=features.dtype)
        return sel * (wgt * inside.astype(features.dtype))[..., None]

    sel = (sel_tap(x0, y0, wx0 * wy0)
           + sel_tap(x0 + 1, y0, wx1 * wy0)
           + sel_tap(x0, y0 + 1, wx0 * wy1)
           + sel_tap(x0 + 1, y0 + 1, wx1 * wy1))
    return jnp.einsum("bnp,bpc->bnc", sel, flat)
