"""Benchmark evaluation harness: MPJPE/MPVPE/root metrics.

Ports the metric math of apps/eval.py exactly:
  * GT joints are regressed FROM GT verts via an extended 21-row
    J_regressor with 5 fingertip one-hots + reorder (eval.py:22-44,
    151-152).
  * Predictions root-centered at ``root_joint`` and scaled by the
    GT/pred joint9-joint0 bone-length ratio (eval.py:176-190).
  * 3D errors in mm, 2D pixel errors through the camera, inter-hand root
    offset error (eval.py:192-241). NOTE: apps/eval.py defines its OWN
    ``xyz2uvd`` (eval.py:81-84) returning only (u, v) — it shadows the
    3-component utils/utils.py:179 version — so the 2D errors norm over
    the 2 pixel components only. Verified against the reference's own
    executable metric block in
    tests/test_reference_oracle_data.py::test_ref_eval_metric_block.

The per-batch computation is one jitted function with a validity mask so
the final partial batch can be padded (static shapes, no recompiles —
the reference instead uses drop_last=False and dynamic batches).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dir_tpu.mano.assets import ManoModel
from dir_tpu.ops.projection import xyz_to_uv


def extended_j_regressor(model: ManoModel) -> jnp.ndarray:
    """(21, 778) regressor: 16 MANO rows + 5 fingertip one-hots, reordered
    (apps/eval.py:27-41). Uses the data-side tip indices."""
    base = np.asarray(model.j_regressor)
    tips = np.zeros((5, base.shape[1]), np.float32)
    for i, v in enumerate((745, 317, 444, 556, 673)):
        tips[i, v] = 1.0
    j21 = np.concatenate([base, tips], axis=0)
    new_order = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18,
                 10, 11, 12, 19, 7, 8, 9, 20]
    return jnp.asarray(j21[new_order])


@partial(jax.jit, static_argnames=("root_joint", "scale_align"))
def batch_errors(pred_verts_left: jnp.ndarray,
                 pred_verts_right: jnp.ndarray,
                 pred_offset: jnp.ndarray,
                 gt_verts_left: jnp.ndarray,
                 gt_verts_right: jnp.ndarray,
                 camera: jnp.ndarray,
                 jreg_left: jnp.ndarray,
                 jreg_right: jnp.ndarray,
                 root_joint: int = 0,
                 scale_align: bool = True) -> Dict[str, jnp.ndarray]:
    """Per-sample, per-point errors (no reduction) — feeds the
    reference-style per-sample dump files (apps/eval.py:271-282).

    Returns: joint_{left,right} (B, 21) m; vert_{left,right} (B, 778) m;
    joint2d/vert2d px; root (B,) m; plus aligned prediction joints.
    """

    def reg(jreg, v):
        return jnp.einsum("jv,bvc->bjc", jreg, v)

    rj = root_joint
    gt_j_l = reg(jreg_left, gt_verts_left)
    gt_j_r = reg(jreg_right, gt_verts_right)
    gt_j2_l = xyz_to_uv(gt_j_l, camera)
    gt_j2_r = xyz_to_uv(gt_j_r, camera)
    gt_v2_l = xyz_to_uv(gt_verts_left, camera)
    gt_v2_r = xyz_to_uv(gt_verts_right, camera)

    gt_offset = gt_j_r[:, rj:rj + 1] - gt_j_l[:, rj:rj + 1]
    root_l_gt = gt_j_l[:, rj:rj + 1]
    root_r_gt = gt_j_r[:, rj:rj + 1]
    len_l_gt = jnp.linalg.norm(gt_j_l[:, 9] - gt_j_l[:, 0], axis=-1)
    len_r_gt = jnp.linalg.norm(gt_j_r[:, 9] - gt_j_r[:, 0], axis=-1)

    pd_j_l = reg(jreg_left, pred_verts_left)
    pd_j_r = reg(jreg_right, pred_verts_right)
    root_l_pd = pd_j_l[:, rj:rj + 1]
    root_r_pd = pd_j_r[:, rj:rj + 1]
    len_l_pd = jnp.linalg.norm(pd_j_l[:, 9] - pd_j_l[:, 0], axis=-1)
    len_r_pd = jnp.linalg.norm(pd_j_r[:, 9] - pd_j_r[:, 0], axis=-1)
    if scale_align:
        sc_l = (len_l_gt / len_l_pd)[:, None, None]
        sc_r = (len_r_gt / len_r_pd)[:, None, None]
    else:
        sc_l = sc_r = jnp.ones_like(len_l_gt)[:, None, None]

    jl = (pd_j_l - root_l_pd) * sc_l
    jr = (pd_j_r - root_r_pd) * sc_r
    vl = (pred_verts_left - root_l_pd) * sc_l
    vr = (pred_verts_right - root_r_pd) * sc_r
    gjl = gt_j_l - root_l_gt
    gjr = gt_j_r - root_r_gt
    gvl = gt_verts_left - root_l_gt
    gvr = gt_verts_right - root_r_gt

    def err(a, b):
        return jnp.linalg.norm(a - b, axis=-1)

    rel_pred = pred_offset[:, None, :] * 0.15
    if root_joint != 0:
        pd_j_r_off = pd_j_r + rel_pred
        rel_pred = (pd_j_r_off[:, rj:rj + 1] - pd_j_l[:, rj:rj + 1])

    return {
        "joint_left": err(jl, gjl),
        "joint_right": err(jr, gjr),
        "vert_left": err(vl, gvl),
        "vert_right": err(vr, gvr),
        "joint2d_left": err(xyz_to_uv(jl + root_l_gt, camera),
                            gt_j2_l),
        "joint2d_right": err(xyz_to_uv(jr + root_r_gt, camera),
                             gt_j2_r),
        "vert2d_left": err(xyz_to_uv(vl + root_l_gt, camera),
                           gt_v2_l),
        "vert2d_right": err(xyz_to_uv(vr + root_r_gt, camera),
                            gt_v2_r),
        "root": jnp.linalg.norm(gt_offset - rel_pred, axis=-1)[:, 0],
        "joints_xyz_left": jl,
        "joints_xyz_right": jr,
        "joints_xyz_left_gt": gjl,
        "joints_xyz_right_gt": gjr,
    }


@partial(jax.jit, static_argnames=("root_joint", "scale_align"))
def batch_metrics(pred_verts_left: jnp.ndarray,
                  pred_verts_right: jnp.ndarray,
                  pred_offset: jnp.ndarray,
                  gt_verts_left: jnp.ndarray,
                  gt_verts_right: jnp.ndarray,
                  camera: jnp.ndarray,
                  jreg_left: jnp.ndarray,
                  jreg_right: jnp.ndarray,
                  valid_mask: jnp.ndarray,
                  root_joint: int = 0,
                  scale_align: bool = True) -> Dict[str, jnp.ndarray]:
    """Per-sample metric sums for one (possibly padded) batch.

    pred_offset: (B, 3) normalized inter-hand offset (x 0.15 -> meters,
    apps/eval.py:170). valid_mask: (B,) 1.0 for real samples.
    Returns sums over valid samples; divide by counts for means.
    """

    def reg(jreg, v):
        return jnp.einsum("jv,bvc->bjc", jreg, v)

    out = {}
    m = valid_mask

    gt_j_l = reg(jreg_left, gt_verts_left)
    gt_j_r = reg(jreg_right, gt_verts_right)
    gt_j2_l = xyz_to_uv(gt_j_l, camera)
    gt_j2_r = xyz_to_uv(gt_j_r, camera)
    gt_v2_l = xyz_to_uv(gt_verts_left, camera)
    gt_v2_r = xyz_to_uv(gt_verts_right, camera)

    rj = root_joint
    gt_offset = gt_j_r[:, rj:rj + 1] - gt_j_l[:, rj:rj + 1]
    root_l_gt = gt_j_l[:, rj:rj + 1]
    root_r_gt = gt_j_r[:, rj:rj + 1]
    len_l_gt = jnp.linalg.norm(gt_j_l[:, 9] - gt_j_l[:, 0], axis=-1)
    len_r_gt = jnp.linalg.norm(gt_j_r[:, 9] - gt_j_r[:, 0], axis=-1)

    pd_j_l = reg(jreg_left, pred_verts_left)
    pd_j_r = reg(jreg_right, pred_verts_right)
    root_l_pd = pd_j_l[:, rj:rj + 1]
    root_r_pd = pd_j_r[:, rj:rj + 1]
    len_l_pd = jnp.linalg.norm(pd_j_l[:, 9] - pd_j_l[:, 0], axis=-1)
    len_r_pd = jnp.linalg.norm(pd_j_r[:, 9] - pd_j_r[:, 0], axis=-1)
    if scale_align:
        sc_l = (len_l_gt / len_l_pd)[:, None, None]
        sc_r = (len_r_gt / len_r_pd)[:, None, None]
    else:
        sc_l = sc_r = jnp.ones_like(len_l_gt)[:, None, None]

    jl = (pd_j_l - root_l_pd) * sc_l
    jr = (pd_j_r - root_r_pd) * sc_r
    vl = (pred_verts_left - root_l_pd) * sc_l
    vr = (pred_verts_right - root_r_pd) * sc_r

    gjl = gt_j_l - root_l_gt
    gjr = gt_j_r - root_r_gt
    gvl = gt_verts_left - root_l_gt
    gvr = gt_verts_right - root_r_gt

    def mean_err(a, b):
        e = jnp.linalg.norm(a - b, axis=-1).mean(axis=-1)  # per sample
        return jnp.sum(e * m)

    out["joint_left_sum_m"] = mean_err(jl, gjl)
    out["joint_right_sum_m"] = mean_err(jr, gjr)
    out["vert_left_sum_m"] = mean_err(vl, gvl)
    out["vert_right_sum_m"] = mean_err(vr, gvr)

    # 2D pixel errors: re-anchor predictions at the GT root
    # (apps/eval.py:212-215).
    out["joint2d_left_sum_px"] = mean_err(
        xyz_to_uv(jl + root_l_gt, camera), gt_j2_l)
    out["joint2d_right_sum_px"] = mean_err(
        xyz_to_uv(jr + root_r_gt, camera), gt_j2_r)
    out["vert2d_left_sum_px"] = mean_err(
        xyz_to_uv(vl + root_l_gt, camera), gt_v2_l)
    out["vert2d_right_sum_px"] = mean_err(
        xyz_to_uv(vr + root_r_gt, camera), gt_v2_r)

    # Inter-hand root offset (apps/eval.py:233-241).
    rel_pred = pred_offset[:, None, :] * 0.15
    if root_joint != 0:
        pd_j_r_off = pd_j_r + rel_pred
        rel_pred = (pd_j_r_off[:, rj:rj + 1] - pd_j_l[:, rj:rj + 1])
    root_err = jnp.linalg.norm(gt_offset - rel_pred, axis=-1)[:, 0]
    out["root_sum_m"] = jnp.sum(root_err * m)

    out["count"] = jnp.sum(m)
    return out


@jax.jit
def online_batch_metrics(pd_joints_left: jnp.ndarray,
                         pd_joints_right: jnp.ndarray,
                         pd_verts_left: jnp.ndarray,
                         pd_verts_right: jnp.ndarray,
                         gt_joints_left: jnp.ndarray,
                         gt_joints_right: jnp.ndarray,
                         gt_verts_left: jnp.ndarray,
                         gt_verts_right: jnp.ndarray,
                         valid_mask: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """The reference's IN-TRAINING metric (dataset/interhand.py:262-315,
    driven by Trainer.test_model, train.py:156-202) — distinct from the
    offline benchmark metric above: root is FIXED at joint 9 (MCP), GT
    joints come straight from the targets (no J_regressor), and the
    scale align uses the joint9-joint0 bone of those target joints.
    Oracle-tested against the reference's own evaluate() in
    tests/test_reference_oracle_data.py::test_ref_online_evaluate.

    Returns per-sample-mean SUMS over valid samples (m) + count;
    divide by count and x1000 for the reference's printed mm numbers.
    """
    m = valid_mask
    out = {}
    for side, pj, pv, gj, gv in (
            ("left", pd_joints_left, pd_verts_left,
             gt_joints_left, gt_verts_left),
            ("right", pd_joints_right, pd_verts_right,
             gt_joints_right, gt_verts_right)):
        root_gt = gj[:, 9:10]
        len_gt = jnp.linalg.norm(gj[:, 9] - gj[:, 0], axis=-1)
        root_pd = pj[:, 9:10]
        len_pd = jnp.linalg.norm(pj[:, 9] - pj[:, 0], axis=-1)
        scale = (len_gt / len_pd)[:, None, None]
        j_err = jnp.linalg.norm((pj - root_pd) * scale - (gj - root_gt),
                                axis=-1).mean(axis=-1)
        v_err = jnp.linalg.norm((pv - root_pd) * scale - (gv - root_gt),
                                axis=-1).mean(axis=-1)
        out[f"joint_{side}_sum_m"] = jnp.sum(j_err * m)
        out[f"vert_{side}_sum_m"] = jnp.sum(v_err * m)
    out["count"] = jnp.sum(m)
    return out


def summarize_online(acc: Dict[str, float]) -> Dict[str, float]:
    """Accumulated online sums -> the reference test_model's mm means
    (train.py:177-199)."""
    n = acc["count"]
    s = {f"{kind}_mean_{side}_mm": acc[f"{kind}_{side}_sum_m"] / n * 1000
         for kind in ("joint", "vert") for side in ("left", "right")}
    s["joint_mean_all_mm"] = (s["joint_mean_left_mm"]
                              + s["joint_mean_right_mm"]) / 2
    s["vert_mean_all_mm"] = (s["vert_mean_left_mm"]
                             + s["vert_mean_right_mm"]) / 2
    return s


def summarize(acc: Dict[str, float]) -> Dict[str, float]:
    """Accumulated sums -> the printed summary of apps/eval.py:294-306."""
    n = acc["count"]
    mm = 1000.0
    s = {
        "joint_mean_left_mm": acc["joint_left_sum_m"] / n * mm,
        "joint_mean_right_mm": acc["joint_right_sum_m"] / n * mm,
        "vert_mean_left_mm": acc["vert_left_sum_m"] / n * mm,
        "vert_mean_right_mm": acc["vert_right_sum_m"] / n * mm,
        "joint2d_mean_left_px": acc["joint2d_left_sum_px"] / n,
        "joint2d_mean_right_px": acc["joint2d_right_sum_px"] / n,
        "vert2d_mean_left_px": acc["vert2d_left_sum_px"] / n,
        "vert2d_mean_right_px": acc["vert2d_right_sum_px"] / n,
        "root_mean_mm": acc["root_sum_m"] / n * mm,
    }
    s["joint_mean_all_mm"] = (s["joint_mean_left_mm"]
                              + s["joint_mean_right_mm"]) / 2
    s["vert_mean_all_mm"] = (s["vert_mean_left_mm"]
                             + s["vert_mean_right_mm"]) / 2
    s["joint2d_mean_all_px"] = (s["joint2d_mean_left_px"]
                                + s["joint2d_mean_right_px"]) / 2
    s["vert2d_mean_all_px"] = (s["vert2d_mean_left_px"]
                               + s["vert2d_mean_right_px"]) / 2
    return s
