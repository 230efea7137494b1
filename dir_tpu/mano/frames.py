"""Zero-pose local joint frames (reference: models/manolayer.py:63-97,
218-228).

``local_frames`` builds, for each of the 15 articulated MANO joints, an
orthonormal frame whose columns are [splay, bend, twist]: the twist axis
points along the bone, palm joints get their splay axis from adjacent
palm-plane normals, and non-palm joints inherit their parent's frame
rotated by the minimal rotation between bone directions. Used for
anatomically-constrained pose parameterizations on top of the layer.
"""

from __future__ import annotations

import jax.numpy as jnp

from dir_tpu.mano.assets import ManoModel
from dir_tpu.mano.layer import _einsum

# MANO-ordered (16-joint) tree data (models/manolayer.py:66-69).
_MANO_SON = (2, 3, 17, 5, 6, 18, 8, 9, 20, 11, 12, 19, 14, 15, 16)
_MANO_PARENT = (-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11, 0, 13, 14)
_PALM_IDX = (13, 1, 4, 10, 7)
_MANO_ORDER = (0, 5, 6, 7, 9, 10, 11, 17, 18, 19, 13, 14, 15, 1, 2, 3, 4,
               8, 12, 16, 20)
# Zero-pose fingertip vertices (models/manolayer.py:225).
_TPOSE_TIPS = (744, 320, 444, 555, 672)


def _norm(v, axis=-1):
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def _minimal_rotation(old_z: jnp.ndarray, new_z: jnp.ndarray) -> jnp.ndarray:
    """Rotation taking old_z to new_z about their common perpendicular
    (models/manolayer.py:51-60)."""
    x = _norm(jnp.cross(old_z, new_z))
    old_y = jnp.cross(old_z, x)
    new_y = jnp.cross(new_z, x)
    old_frame = jnp.stack([x, old_y, old_z], axis=-1)
    new_frame = jnp.stack([x, new_y, new_z], axis=-1)
    return new_frame @ jnp.swapaxes(old_frame, -1, -2)


def build_frames(skel21: jnp.ndarray) -> jnp.ndarray:
    """(B, 21, 3) joints (21-joint order) -> (B, 15, 3, 3) local frames
    (models/manolayer.py:63-97)."""
    skel = skel21[:, jnp.asarray(_MANO_ORDER)]
    z = skel[:, jnp.asarray(_MANO_SON)] - skel[:, 1:16]
    z = _norm(z)  # (B, 15, 3)
    z = jnp.concatenate([jnp.zeros_like(z[:, :1]), z], axis=1)  # (B, 16, 3)

    # palm-plane normals give palm-joint splay axes
    palm = skel[:, jnp.asarray(_PALM_IDX)] - skel[:, 0:1]  # (B, 5, 3)
    n = _norm(jnp.cross(palm[:, :-1], palm[:, 1:]))  # (B, 4, 3)
    palm_x = jnp.concatenate([n, jnp.zeros_like(n[:, :1])], axis=1) + \
        jnp.concatenate([jnp.zeros_like(n[:, :1]), n], axis=1)
    palm_x = _norm(palm_x)  # (B, 5, 3)

    frames = [None] * 16
    palm_set = set(_PALM_IDX)
    for i, pj in enumerate(_PALM_IDX):
        zx = z[:, pj]
        x = palm_x[:, i]
        y = _norm(jnp.cross(zx, x))
        x = jnp.cross(y, zx)
        frames[pj] = jnp.stack([x, y, zx], axis=-1)
    for i in range(1, 16):
        if i in palm_set:
            continue
        p = _MANO_PARENT[i]
        rot = _minimal_rotation(z[:, p], z[:, i])
        frames[i] = jnp.einsum("bij,bjk->bik", rot, frames[p])
    return jnp.stack(frames[1:], axis=1)  # (B, 15, 3, 3)


def local_frames(model: ManoModel, betas: jnp.ndarray) -> jnp.ndarray:
    """(B, 10) betas -> (B, 15, 3, 3) zero-pose local joint frames
    (models/manolayer.py:218-228)."""
    v_shaped = _einsum("vcs,bs->bvc", model.shapedirs, betas) + \
        model.v_template
    j16 = _einsum("jv,bvc->bjc", model.j_regressor, v_shaped)
    tips = v_shaped[:, jnp.asarray(_TPOSE_TIPS)]
    j21 = jnp.concatenate([j16, tips], axis=1)
    return build_frames(j21[:, jnp.asarray(
        (0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
         10, 11, 12, 19, 7, 8, 9, 20))])
