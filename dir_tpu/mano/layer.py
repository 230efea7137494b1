"""Differentiable MANO layer: pure-functional, fully batched, fp32.

One core skinning function (:func:`mano_skin`) backs both MANO APIs the
reference uses:

  * :func:`mano_forward_pca6d` — the in-network API: 6D global rotation +
    45 PCA pose coefficients + 10 betas, quaternion-Rodrigues pose map,
    robust 6D root (manopth/manopth/manolayer.py:110-270 as configured at
    models/dir.py:221-224).
  * :func:`mano_forward_rotmat` — the data-side API: explicit root
    rotation matrix + PCA-or-rotmat finger pose + trans/scale, classic
    Rodrigues (models/manolayer.py:251-323).

Design: the kinematic chain is evaluated as three level-batched (B, 5)
4x4 compositions instead of a 16-step scan — constant depth, MXU/VPU
friendly, identical math. All contractions run at HIGHEST precision; the
layer is the numerical heart of the mm-level benchmark metrics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from dir_tpu.mano.assets import (JOINT_REORDER, KIN_REORDER, LEV1, LEV2, LEV3,
                                 ManoModel)
from dir_tpu.ops.rotation import (batch_rodrigues, robust_rot6d_to_rotmat,
                                  rodrigues, rot6d_to_rotmat)

_HI = lax.Precision.HIGHEST

_PRECISIONS = {
    "highest": lax.Precision.HIGHEST,  # bf16x6: bit-level parity work
    "high": lax.Precision.HIGH,        # bf16x3: ~1e-6 rel err, 2x faster
    "default": lax.Precision.DEFAULT,
}


def _einsum(expr, *args, prec=_HI):
    return jnp.einsum(expr, *args, precision=prec)


def _rt_to_se3(rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """([..., 3, 3], [..., 3]) -> [..., 4, 4] rigid transform."""
    top = jnp.concatenate([rot, trans[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], rot.dtype),
        top.shape[:-2] + (1, 4))
    return jnp.concatenate([top, bottom], axis=-2)


def pca_to_axis(model: ManoModel, pca: jnp.ndarray,
                add_mean: bool = True) -> jnp.ndarray:
    """(B, ncomps) PCA coefficients -> (B, 45) axis-angle finger pose."""
    axis = _einsum("bc,cp->bp", pca, model.hands_components[: pca.shape[1]])
    if add_mean:
        axis = axis + model.hands_mean
    return axis


def axis_to_pca(model: ManoModel, axis: jnp.ndarray) -> jnp.ndarray:
    """(B, 45) axis-angle -> (B, 45) PCA coefficients (inverse of the
    full-rank basis; models/manolayer.py:178-182)."""
    inv = jnp.linalg.inv(model.hands_components)
    return _einsum("bp,pc->bc", axis - model.hands_mean[None], inv)


def mano_skin(model: ManoModel,
              root_rot: jnp.ndarray,
              local_rots: jnp.ndarray,
              betas: jnp.ndarray,
              center_idx: int | None = None,
              precision: str = "highest"):
    """Core MANO skinning.

    Args:
        model: constant ManoModel pytree.
        root_rot: (B, 3, 3) global wrist rotation.
        local_rots: (B, 15, 3, 3) per-joint local rotations
            (order: MANO joints 1..15).
        betas: (B, 10) shape coefficients.
        center_idx: if not None, subtract joint ``center_idx`` (21-joint
            order) from verts and joints.
        precision: matmul precision for the blend/skinning contractions;
            "highest" (bf16x6, bit-parity work) or "high" (bf16x3,
            ~1e-6 relative error — far below the mm-level metrics, and
            about half the MXU passes; use for training).
    Returns:
        verts (B, 778, 3), joints (B, 21, 3).
    """
    prec = _PRECISIONS[precision]
    b = root_rot.shape[0]
    dtype = root_rot.dtype

    # Shape blend + rest joints (manopth/manolayer.py:170-183).
    v_shaped = _einsum("vcs,bs->bvc", model.shapedirs, betas,
                       prec=prec) + model.v_template
    j_rest = _einsum("jv,bvc->bjc", model.j_regressor, v_shaped,
                     prec=prec)  # (B, 16, 3)

    # Pose blend: driver is flattened (R - I) (manopth/manolayer.py:186-187).
    eye = jnp.eye(3, dtype=dtype)
    pose_map = (local_rots - eye).reshape(b, 135)
    v_posed = v_shaped + _einsum("vcp,bp->bvc", model.posedirs, pose_map,
                                 prec=prec)

    # Level-batched kinematics (manopth/manolayer.py:192-228).
    lev1, lev2, lev3 = jnp.asarray(LEV1), jnp.asarray(LEV2), jnp.asarray(LEV3)
    root_j = j_rest[:, 0]
    t_root = _rt_to_se3(root_rot, root_j)  # (B, 4, 4)

    def level(prev, idxs, parent_j):
        rots = local_rots[:, idxs - 1]              # (B, 5, 3, 3)
        rel_t = j_rest[:, idxs] - parent_j          # (B, 5, 3)
        rel = _rt_to_se3(rots, rel_t)
        return jnp.einsum("bfij,bfjk->bfik", prev, rel, precision=prec)

    t1 = level(jnp.broadcast_to(t_root[:, None], (b, 5, 4, 4)),
               lev1, root_j[:, None])
    t2 = level(t1, lev2, j_rest[:, lev1])
    t3 = level(t2, lev3, j_rest[:, lev2])
    transforms = jnp.concatenate(
        [t_root[:, None], t1, t2, t3], axis=1)[:, jnp.asarray(KIN_REORDER)]

    joints16 = transforms[:, :, :3, 3]

    # Inverse bind: A' = A - [0 | A @ (j, 0)] (manopth/manolayer.py:231-233).
    j_h = jnp.concatenate([j_rest, jnp.zeros((b, 16, 1), dtype)], axis=-1)
    bind_t = jnp.einsum("bjik,bjk->bji", transforms, j_h, precision=prec)
    rel_transforms = transforms.at[:, :, :, 3].add(-bind_t)
    # (equivalent to subtracting only in the translation column since
    # bind_t's 4th component is 0 for rotation-free homogeneous points)

    # LBS (manopth/manolayer.py:235-245): per-vertex blended transforms.
    m = _einsum("vj,bjik->bvik", model.weights, rel_transforms,
                prec=prec)  # (B,778,4,4)
    verts = (
        jnp.einsum("bvik,bvk->bvi", m[:, :, :3, :3], v_posed,
                   precision=prec)
        + m[:, :, :3, 3]
    )

    tips = verts[:, model.tips]
    joints = jnp.concatenate([joints16, tips], axis=1)
    joints = joints[:, jnp.asarray(JOINT_REORDER)]

    if center_idx is not None:
        center = joints[:, center_idx:center_idx + 1]
        verts = verts - center
        joints = joints - center
    return verts, joints


def _pca6d_impl(model: ManoModel,
                pose_coeffs: jnp.ndarray,
                betas: jnp.ndarray,
                center_idx: int | None = 0,
                flat_hand_mean: bool = False,
                robust_rot: bool = True,
                precision: str = "highest"):
    ncomps = pose_coeffs.shape[1] - 6
    axis45 = pca_to_axis(model, pose_coeffs[:, 6:6 + ncomps],
                         add_mean=not flat_hand_mean)
    # Quaternion-Rodrigues pose map — the manopth path
    # (manopth/tensutils.py:6-13).
    local_rots = batch_rodrigues(axis45.reshape(-1, 3)).reshape(-1, 15, 3, 3)
    if robust_rot:
        root_rot = robust_rot6d_to_rotmat(pose_coeffs[:, :6])
    else:
        root_rot = rot6d_to_rotmat(pose_coeffs[:, :6])
    return mano_skin(model, root_rot, local_rots, betas, center_idx,
                     precision=precision)


@partial(jax.jit, static_argnames=("center_idx", "flat_hand_mean",
                                   "robust_rot"))
def mano_forward_pca6d(model: ManoModel,
                       pose_coeffs: jnp.ndarray,
                       betas: jnp.ndarray,
                       center_idx: int | None = 0,
                       flat_hand_mean: bool = False,
                       robust_rot: bool = True):
    """In-network MANO API: (B, 6 + ncomps) [6D root | PCA pose], (B, 10).

    Returns (verts, joints) in meters, root-centered at ``center_idx``.
    """
    return _pca6d_impl(model, pose_coeffs, betas, center_idx,
                       flat_hand_mean, robust_rot)


def stack_mano_pair(left: ManoModel, right: ManoModel) -> ManoModel:
    """Stack both hands' constants along a leading axis for the paired
    forward (every op then processes both hands at once — the hand loop
    the reference runs twice per stage collapses into one vmapped call)."""
    return jax.tree.map(lambda a, b: jnp.stack([a, b]), left, right)


def mano_forward_pca6d_pair(pair: ManoModel,
                            pose_coeffs: jnp.ndarray,
                            betas: jnp.ndarray,
                            center_idx: int | None = 0,
                            flat_hand_mean: bool = False,
                            robust_rot: bool = True,
                            precision: str = "highest"):
    """Paired forward: pair from :func:`stack_mano_pair`; pose/betas have
    a leading hand axis (2, B, ...). Returns (verts, joints) (2, B, ...)."""
    fn = partial(_pca6d_impl, center_idx=center_idx,
                 flat_hand_mean=flat_hand_mean, robust_rot=robust_rot,
                 precision=precision)
    return jax.vmap(fn, in_axes=(0, 0, 0))(pair, pose_coeffs, betas)


@partial(jax.jit, static_argnames=("center_idx",))
def mano_forward_rotmats_proj(model: ManoModel,
                              pose_mats: jnp.ndarray,
                              betas: jnp.ndarray,
                              center_idx: int | None = 0):
    """manopth joint_rot_mode='rotmat' API: (B, 16, 3, 3) approximate
    rotations are SVD-projected to SO(3) before skinning
    (manopth/manolayer.py:156-167)."""
    from dir_tpu.ops.rotation import rotation_project
    mats = rotation_project(pose_mats)
    return mano_skin(model, mats[:, 0], mats[:, 1:], betas, center_idx)


@partial(jax.jit, static_argnames=("center_idx", "use_pca"))
def mano_forward_rotmat(model: ManoModel,
                        root_rot: jnp.ndarray,
                        pose: jnp.ndarray,
                        shape: jnp.ndarray,
                        trans: jnp.ndarray | None = None,
                        scale: jnp.ndarray | None = None,
                        center_idx: int | None = 9,
                        use_pca: bool = True):
    """Data-side MANO API (models/manolayer.py:251-323).

    Args:
        root_rot: (B, 3, 3).
        pose: (B, ncomps) PCA coefficients if use_pca else (B, 15, 3, 3).
        shape: (B, 10); trans: (B, 3) or None; scale: (B,) or None.
    """
    if use_pca:
        axis45 = pca_to_axis(model, pose, add_mean=True)
        # Classic Rodrigues — the data-side path (models/manolayer.py:32-48).
        local_rots = rodrigues(axis45.reshape(-1, 3)).reshape(-1, 15, 3, 3)
    else:
        local_rots = pose
    verts, joints = mano_skin(model, root_rot, local_rots, shape, center_idx)
    if scale is not None:
        verts = verts * scale[:, None, None]
        joints = joints * scale[:, None, None]
    if trans is not None:
        verts = verts + trans[:, None, :]
        joints = joints + trans[:, None, :]
    return verts, joints
