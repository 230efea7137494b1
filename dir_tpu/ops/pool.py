"""3x3/stride-2 max pooling as shifted strided-slice maxes.

DOCUMENTED NEGATIVE RESULT — exact but slower; NOT wired in.

The backbone's pooling (reference models/backbone/resnet.py:155, torch
MaxPool2d(3, stride=2, padding=1)) lowered through ``reduce_window`` +
``select_and_scatter`` costs ~2.7 ms/step at b64 on v5e — ~8x the HBM
roofline for the bytes touched — so this module reformulates it as
three shifted strided slices per axis and a max tree (backward:
selects + zero-fill pad-scatters). Measured END-TO-END on v5e (2026-08,
b64 bf16 train step): 79.3 ms vs 64.2 ms with the native lowering —
the stride-2 W slices land on the sublane axis and the resulting data
formatting plus the scatter-shaped backward cost far more than the
window ops saved. Kept (with its exactness test,
tests/test_components.py::test_max_pool_3x3_s2_matches_reduce_window)
as the record of what was tried; revisit only if Mosaic gains a fused
pooling primitive.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def max_pool_3x3_s2(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, C); H, W even.

    Equivalent to torch MaxPool2d(3, stride=2, padding=1) /
    flax nn.max_pool((3,3), (2,2), padding=((1,1),(1,1))).
    """
    b, h, w, c = x.shape
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    oh, ow = h // 2, w // 2
    if jnp.issubdtype(x.dtype, jnp.inexact):
        neg = jnp.array(-jnp.inf, x.dtype)
    else:
        neg = jnp.iinfo(x.dtype).min
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)),
                 constant_values=neg)
    # rows: out i reads padded rows 2i, 2i+1, 2i+2
    r = jnp.maximum(
        jnp.maximum(lax.slice_in_dim(xp, 0, 2 * oh - 1, 2, axis=1),
                    lax.slice_in_dim(xp, 1, 2 * oh, 2, axis=1)),
        lax.slice_in_dim(xp, 2, 2 * oh + 1, 2, axis=1))
    rp = jnp.pad(r, ((0, 0), (0, 0), (1, 1), (0, 0)),
                 constant_values=neg)
    return jnp.maximum(
        jnp.maximum(lax.slice_in_dim(rp, 0, 2 * ow - 1, 2, axis=2),
                    lax.slice_in_dim(rp, 1, 2 * ow, 2, axis=2)),
        lax.slice_in_dim(rp, 2, 2 * ow + 1, 2, axis=2))
