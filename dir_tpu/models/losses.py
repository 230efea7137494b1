"""DIR training losses and assembly.

Reimplements models/loss.py (custom SmoothL1 / normal / edge),
models/lovasz_loss.py (Lovász-softmax, jit-safe via presence masking
instead of Python-level class skipping), weighted cross-entropy, and the
full loss assembly of models/dir.py:504-594 with identical weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dir_tpu.config import ModelConfig

sg = jax.lax.stop_gradient


def smooth_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Piecewise MSE/L1 with 0.01 threshold, per-sample mean over the
    flattened residual then batch mean (models/loss.py:63-91)."""
    b = x.shape[0]
    z = (x - y).reshape(b, -1)
    az = jnp.abs(z)
    mse = 0.5 * z * z
    l1 = 0.01 * (az - 0.005)
    per_elem = jnp.where(az < 0.01, mse, l1)
    return jnp.mean(jnp.mean(per_elem, axis=-1))


def _normalize(v: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize semantics: v / max(||v||, eps).

    Clamped INSIDE the sqrt (same value, sqrt is monotone): clamping
    after gives a 0 * inf = NaN VJP on exactly-degenerate rows — see
    ops/rotation.py _normalize_rows."""
    n = jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True),
                             eps * eps))
    return v / n


def _face_edges(coord: jnp.ndarray, faces: jnp.ndarray):
    """Per-face edge difference vectors (v1, v2, v3) via one-hot matmuls.

    Gathers over 1538 faces have a scatter-add backward — slow on TPU.
    ``faces`` is a compile-time constant, so the edge-difference
    selection matrices (F, V) constant-fold and both directions run on
    the MXU (exact: entries are +-1).
    """
    nv = coord.shape[1]
    f0 = jax.nn.one_hot(faces[:, 0], nv, dtype=coord.dtype)
    f1 = jax.nn.one_hot(faces[:, 1], nv, dtype=coord.dtype)
    f2 = jax.nn.one_hot(faces[:, 2], nv, dtype=coord.dtype)
    e1 = jnp.einsum("fv,bvc->bfc", f1 - f0, coord)
    e2 = jnp.einsum("fv,bvc->bfc", f2 - f0, coord)
    e3 = jnp.einsum("fv,bvc->bfc", f2 - f1, coord)
    return e1, e2, e3


def normal_vector_loss(coord_out: jnp.ndarray, coord_gt: jnp.ndarray,
                       faces: jnp.ndarray) -> jnp.ndarray:
    """|cos| between predicted edges and GT face normals
    (models/loss.py:6-33)."""
    e1o, e2o, e3o = _face_edges(coord_out, faces)
    e1g, e2g, _ = _face_edges(coord_gt, faces)
    v1o, v2o, v3o = _normalize(e1o), _normalize(e2o), _normalize(e3o)
    ng = _normalize(jnp.cross(_normalize(e1g), _normalize(e2g)))
    cos1 = jnp.abs(jnp.sum(v1o * ng, -1))
    cos2 = jnp.abs(jnp.sum(v2o * ng, -1))
    cos3 = jnp.abs(jnp.sum(v3o * ng, -1))
    return jnp.mean(jnp.stack([cos1, cos2, cos3]))


def edge_length_loss(coord_out: jnp.ndarray, coord_gt: jnp.ndarray,
                     faces: jnp.ndarray) -> jnp.ndarray:
    """|edge-length difference| over faces (models/loss.py:36-60)."""
    eo = _face_edges(coord_out, faces)
    eg = _face_edges(coord_gt, faces)

    def elen(e):
        return jnp.sqrt(jnp.sum(e ** 2, -1) + 1e-12)

    diffs = [jnp.abs(elen(a) - elen(b)) for a, b in zip(eo, eg)]
    return jnp.mean(jnp.stack(diffs))


def weighted_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                           class_weights) -> jnp.ndarray:
    """torch nn.CrossEntropyLoss(weight=w) semantics: weighted mean of
    per-pixel NLL, normalized by the summed weights of the taken classes.

    logits: (B, H, W, C); labels: (B, H, W) int.
    """
    w = jnp.asarray(class_weights, logits.dtype)
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction instead of take_along_axis: the gather's
    # backward is a TPU scatter into logp; this stays elementwise.
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logits.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    pix_w = jnp.sum(w * onehot, axis=-1)
    return jnp.sum(nll * pix_w) / jnp.sum(pix_w)


def _lovasz_grad(gt_sorted: jnp.ndarray) -> jnp.ndarray:
    """Gradient of the Lovász extension w.r.t. sorted errors
    (lovasz_loss.py:19-31). Batched: ``gt_sorted`` is (..., N) sorted
    along the LAST axis; cumsums run per leading index."""
    gts = jnp.sum(gt_sorted, axis=-1, keepdims=True)
    intersection = gts - jnp.cumsum(gt_sorted, axis=-1)
    union = gts + jnp.cumsum(1.0 - gt_sorted, axis=-1)
    jaccard = 1.0 - intersection / union
    return jnp.concatenate([jaccard[..., :1],
                            jaccard[..., 1:] - jaccard[..., :-1]], axis=-1)


def lovasz_softmax(probas: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Multi-class Lovász-softmax surrogate (lovasz_loss.py:155-201),
    classes='present', per_image=False.

    probas: (B, H, W, C) — NOTE the reference feeds raw logits here
    (models/dir.py:569) and we keep that behavior; labels: (B, H, W) int.

    jit-safe: every class is computed and masked by presence rather than
    skipped in Python. TPU shape: the whole Lovász weight computation is
    two batched minor-axis ``lax.sort`` calls on a (C, N) layout that
    carry their payloads THROUGH the sort — no take_along_axis anywhere
    (a (C, N) minor-axis gather measured ~5x the cost of the sort
    itself; major-axis sorts and scatter-of-iota were worse still).
    """
    c = probas.shape[-1]
    flat = probas.reshape(-1, c).T                    # (C, N)
    lab = labels.reshape(-1)

    fg = jax.nn.one_hot(lab, c, dtype=flat.dtype).T   # (C, N)
    errors = jnp.abs(fg - flat)                       # (C, N)
    # Lovász weights (detached per the reference, lovasz_loss.py:109):
    # sort #1 descends by error carrying (fg, position); sort #2 keys by
    # position to un-sort the weights — dot(relu(errors_sorted), grad)
    # == dot(relu(errors), w). The differentiable path stays elementwise
    # (no gather/scatter on TPU; sorts see only detached values).
    pos = jax.lax.broadcasted_iota(jnp.int32, errors.shape, 1)
    _, fg_sorted, order = jax.lax.sort(
        (sg(-errors), sg(fg), pos), dimension=-1, num_keys=1)
    grad = _lovasz_grad(fg_sorted)                    # (C, N)
    _, w = jax.lax.sort((order, grad), dimension=-1, num_keys=1)
    w = sg(w)
    losses = jnp.sum(jax.nn.relu(errors) * w, axis=-1)  # (C,)
    present = (jnp.sum(fg, axis=-1) > 0).astype(losses.dtype)
    return jnp.sum(losses * present) / jnp.maximum(jnp.sum(present), 1.0)


def dir_losses(outputs: dict, targets: dict, cfg: ModelConfig,
               faces_left: jnp.ndarray, faces_right: jnp.ndarray,
               fused_stages: bool = False) -> dict:
    """Full DIR loss dict (models/dir.py:541-594). Sum the values for the
    total training loss (train.py:69).

    fused_stages: compute each per-stage term ONCE over the three stages
    stacked along the batch axis (sum over stages == 3 x the stacked
    mean since all stages have identical element counts — exact). Cuts
    the loss-op count ~3x; the dict then carries aggregated ``*_all``
    keys instead of per-stage entries. Used inside the train step where
    only the total matters.

    targets (all NHWC / batch-first, fp32 unless noted):
        joint_2d_{left,right}: (B, 21, 3) [-1,1] uv + depth
        mesh_2d_{left,right}: (B, 778, 3)
        joint_3d_{left,right}: (B, 21, 3) meters (camera frame)
        mesh_3d_{left,right}: (B, 778, 3)
        center_{left,right}: (B, 1, 3) MCP joint (9) position
        seg: (B, 256, 256) int32 {0 bg, 1 left, 2 right}
        dense: (B, 256, 256, 3) dense correspondence colors in [0, 1]
    """
    s = cfg.coord_scale
    loss = {}

    # --- seg / dense heads at 32x32 (dir.py:562-569) ---
    seg_logits = outputs["seg"]
    map_size = seg_logits.shape[1]
    stride = targets["seg"].shape[1] // map_size
    # torch nearest-downsample picks src index dst*stride exactly.
    gt_seg = targets["seg"][:, ::stride, ::stride]
    # antialias=False: torch F.interpolate(mode='bilinear') does NOT
    # antialias on downsample (dir.py:566); jax.image.resize defaults to
    # antialias=True, which disagrees by up to 0.47 on [0,1] data
    # (oracle: tests/test_reference_oracle.py dense-downsample check).
    gt_dense = jax.image.resize(
        targets["dense"],
        (targets["dense"].shape[0], map_size, map_size, 3), method="linear",
        antialias=False)
    loss["seg"] = weighted_cross_entropy(
        seg_logits, gt_seg, cfg.seg_class_weights) * cfg.seg_weight * \
        cfg.dense_weight
    loss["dense"] = smooth_l1(outputs["dense"], gt_dense) * cfg.dense_weight
    loss["lovasz"] = lovasz_softmax(seg_logits, gt_seg) * \
        cfg.lovasz_weight * cfg.dense_weight

    # --- per-stage coordinate losses (dir.py:571-594) ---
    cl = targets["center_left"]
    cr = targets["center_right"]
    gt_j_l = (targets["joint_3d_left"] - cl) / s
    gt_j_r = (targets["joint_3d_right"] - cr) / s
    gt_m_l = (targets["mesh_3d_left"] - cl) / s
    gt_m_r = (targets["mesh_3d_right"] - cr) / s
    gt_offset = ((cr - cl) / s)[:, 0]

    cw = cfg.coord_weight
    if fused_stages:
        n = len(outputs["stages"])
        stacked = jax.tree.map(lambda *xs: jnp.concatenate(xs, 0),
                               *outputs["stages"])

        def tile(x):
            return jnp.concatenate([x] * n, 0)

        loss["joint_left_uv_all"] = smooth_l1(
            stacked["pd_joint_uv_left"],
            tile(targets["joint_2d_left"][:, :, :2])) * cw * n
        loss["joint_right_uv_all"] = smooth_l1(
            stacked["pd_joint_uv_right"],
            tile(targets["joint_2d_right"][:, :, :2])) * cw * n
        loss["mesh_left_uv_all"] = smooth_l1(
            stacked["pd_mesh_uv_left"],
            tile(targets["mesh_2d_left"][:, :, :2])) * cw * n
        loss["mesh_right_uv_all"] = smooth_l1(
            stacked["pd_mesh_uv_right"],
            tile(targets["mesh_2d_right"][:, :, :2])) * cw * n

        j_l = stacked["pd_joint_xyz_left"] / s
        j_r = stacked["pd_joint_xyz_right"] / s
        m_l = stacked["pd_mesh_xyz_left"] / s
        m_r = stacked["pd_mesh_xyz_right"] / s
        loss["joint_left_xyz_all"] = smooth_l1(j_l, tile(gt_j_l)) * cw * n
        loss["joint_right_xyz_all"] = smooth_l1(j_r, tile(gt_j_r)) * cw * n
        loss["mesh_left_xyz_all"] = smooth_l1(m_l, tile(gt_m_l)) * cw * n
        loss["mesh_right_xyz_all"] = smooth_l1(m_r, tile(gt_m_r)) * cw * n

        loss["edge_left_all"] = edge_length_loss(
            m_l, tile(gt_m_l), faces_left) * cfg.edge_weight * n
        loss["edge_right_all"] = edge_length_loss(
            m_r, tile(gt_m_r), faces_right) * cfg.edge_weight * n
        loss["normal_left_all"] = normal_vector_loss(
            m_l, tile(gt_m_l), faces_left) * cfg.normal_weight * n
        loss["normal_right_all"] = normal_vector_loss(
            m_r, tile(gt_m_r), faces_right) * cfg.normal_weight * n
        loss["offset_all"] = smooth_l1(stacked["pd_offset"],
                                       tile(gt_offset)) * cw * n
        return loss

    for i, out in enumerate(outputs["stages"]):
        loss[f"joint_left_uv_{i}"] = smooth_l1(
            out["pd_joint_uv_left"], targets["joint_2d_left"][:, :, :2]) * cw
        loss[f"joint_right_uv_{i}"] = smooth_l1(
            out["pd_joint_uv_right"], targets["joint_2d_right"][:, :, :2]) * cw
        loss[f"mesh_left_uv_{i}"] = smooth_l1(
            out["pd_mesh_uv_left"], targets["mesh_2d_left"][:, :, :2]) * cw
        loss[f"mesh_right_uv_{i}"] = smooth_l1(
            out["pd_mesh_uv_right"], targets["mesh_2d_right"][:, :, :2]) * cw

        j_l = out["pd_joint_xyz_left"] / s
        j_r = out["pd_joint_xyz_right"] / s
        m_l = out["pd_mesh_xyz_left"] / s
        m_r = out["pd_mesh_xyz_right"] / s
        loss[f"joint_left_xyz_{i}"] = smooth_l1(j_l, gt_j_l) * cw
        loss[f"joint_right_xyz_{i}"] = smooth_l1(j_r, gt_j_r) * cw
        loss[f"mesh_left_xyz_{i}"] = smooth_l1(m_l, gt_m_l) * cw
        loss[f"mesh_right_xyz_{i}"] = smooth_l1(m_r, gt_m_r) * cw

        loss[f"edge_left_{i}"] = edge_length_loss(
            m_l, gt_m_l, faces_left) * cfg.edge_weight
        loss[f"edge_right_{i}"] = edge_length_loss(
            m_r, gt_m_r, faces_right) * cfg.edge_weight
        loss[f"normal_left_{i}"] = normal_vector_loss(
            m_l, gt_m_l, faces_left) * cfg.normal_weight
        loss[f"normal_right_{i}"] = normal_vector_loss(
            m_r, gt_m_r, faces_right) * cfg.normal_weight

        loss[f"offset_{i}"] = smooth_l1(out["pd_offset"], gt_offset) * cw

    return loss


def total_loss(loss_dict: dict) -> jnp.ndarray:
    return sum(loss_dict.values())
