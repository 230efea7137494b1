"""Loss parity tests against torch / numpy oracles."""

import numpy as np
import jax.numpy as jnp
import torch

from dir_tpu.models import losses


def test_smooth_l1_matches_oracle(rng):
    x = rng.randn(4, 21, 3).astype(np.float32) * 0.05
    y = rng.randn(4, 21, 3).astype(np.float32) * 0.05
    got = float(losses.smooth_l1(jnp.asarray(x), jnp.asarray(y)))
    z = (x - y).reshape(4, -1)
    per = np.where(np.abs(z) < 0.01, 0.5 * z ** 2, 0.01 * (np.abs(z) - 0.005))
    want = per.mean(-1).mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_ce_matches_torch(rng):
    logits = rng.randn(2, 8, 8, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(2, 8, 8))
    w = (0.1, 0.45, 0.45)
    got = float(losses.weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), w))
    t_logits = torch.from_numpy(logits).permute(0, 3, 1, 2)
    t_labels = torch.from_numpy(labels).long()
    want = torch.nn.CrossEntropyLoss(weight=torch.tensor(w))(
        t_logits, t_labels).item()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _lovasz_oracle(probas, labels):
    """Numpy reimplementation of the reference algorithm with Python-level
    'present' class skipping (lovasz_loss.py:155-201)."""
    c = probas.shape[-1]
    flat = probas.reshape(-1, c)
    lab = labels.reshape(-1)
    out = []
    for ci in range(c):
        fg = (lab == ci).astype(np.float64)
        if fg.sum() == 0:
            continue
        errors = np.abs(fg - flat[:, ci])
        order = np.argsort(-errors, kind="stable")
        es = errors[order]
        fs = fg[order]
        gts = fs.sum()
        inter = gts - np.cumsum(fs)
        union = gts + np.cumsum(1 - fs)
        jac = 1 - inter / union
        jac[1:] = jac[1:] - jac[:-1]
        out.append(np.dot(np.maximum(es, 0), jac))
    return np.mean(out)


def test_lovasz_matches_oracle(rng):
    logits = rng.randn(2, 8, 8, 3).astype(np.float32)
    labels = rng.randint(0, 3, size=(2, 8, 8))
    got = float(losses.lovasz_softmax(jnp.asarray(logits),
                                      jnp.asarray(labels)))
    want = _lovasz_oracle(logits.astype(np.float64), labels)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_lovasz_missing_class(rng):
    logits = rng.randn(1, 8, 8, 3).astype(np.float32)
    labels = np.zeros((1, 8, 8), np.int64)  # only class 0 present
    got = float(losses.lovasz_softmax(jnp.asarray(logits),
                                      jnp.asarray(labels)))
    want = _lovasz_oracle(logits.astype(np.float64), labels)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_edge_and_normal_losses(rng):
    faces = jnp.asarray(
        np.stack([rng.choice(50, 3, replace=False) for _ in range(30)]),
        jnp.int32)
    gt = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    # identical meshes: edge loss exactly 0
    assert float(losses.edge_length_loss(gt, gt, faces)) < 1e-6
    pred = gt + 0.1 * jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    assert float(losses.edge_length_loss(pred, gt, faces)) > 0
    nv = float(losses.normal_vector_loss(pred, gt, faces))
    assert 0 <= nv <= 1.0


def test_normal_loss_zero_for_gt_plane():
    """Edges lying in the GT face plane are orthogonal to its normal."""
    verts = jnp.asarray(
        [[[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]]], jnp.float32)
    faces = jnp.asarray([[0, 1, 2], [1, 3, 2]], jnp.int32)
    got = float(losses.normal_vector_loss(verts, verts, faces))
    assert got < 1e-6


def test_fused_stage_losses_match_sum(rng):
    """fused_stages=True totals == per-stage totals (exact stacking)."""
    import jax.numpy as jnp
    from dir_tpu.config import ModelConfig
    from dir_tpu.models.losses import dir_losses, total_loss

    cfg = ModelConfig()
    b, n_stages = 2, 3
    faces = jnp.asarray(
        np.stack([rng.choice(778, 3, replace=False) for _ in range(40)]),
        jnp.int32)

    def stage():
        return {
            "pd_joint_uv_left": jnp.asarray(rng.randn(b, 21, 2), jnp.float32),
            "pd_joint_uv_right": jnp.asarray(rng.randn(b, 21, 2), jnp.float32),
            "pd_mesh_uv_left": jnp.asarray(rng.randn(b, 778, 2), jnp.float32),
            "pd_mesh_uv_right": jnp.asarray(rng.randn(b, 778, 2), jnp.float32),
            "pd_joint_xyz_left": jnp.asarray(rng.randn(b, 21, 3) * 0.1,
                                             jnp.float32),
            "pd_joint_xyz_right": jnp.asarray(rng.randn(b, 21, 3) * 0.1,
                                              jnp.float32),
            "pd_mesh_xyz_left": jnp.asarray(rng.randn(b, 778, 3) * 0.1,
                                            jnp.float32),
            "pd_mesh_xyz_right": jnp.asarray(rng.randn(b, 778, 3) * 0.1,
                                             jnp.float32),
            "pd_offset": jnp.asarray(rng.randn(b, 3), jnp.float32),
            "pd_mano_para_left": jnp.zeros((b, 64), jnp.float32),
            "pd_mano_para_right": jnp.zeros((b, 64), jnp.float32),
            "pd_proj_left": jnp.zeros((b, 3), jnp.float32),
            "pd_proj_right": jnp.zeros((b, 3), jnp.float32),
        }

    outputs = {"stages": [stage() for _ in range(n_stages)],
               "seg": jnp.asarray(rng.randn(b, 32, 32, 3), jnp.float32),
               "dense": jnp.asarray(rng.rand(b, 32, 32, 3), jnp.float32)}
    targets = {
        "joint_2d_left": jnp.asarray(rng.randn(b, 21, 3), jnp.float32),
        "joint_2d_right": jnp.asarray(rng.randn(b, 21, 3), jnp.float32),
        "mesh_2d_left": jnp.asarray(rng.randn(b, 778, 3), jnp.float32),
        "mesh_2d_right": jnp.asarray(rng.randn(b, 778, 3), jnp.float32),
        "joint_3d_left": jnp.asarray(rng.randn(b, 21, 3) * 0.1, jnp.float32),
        "joint_3d_right": jnp.asarray(rng.randn(b, 21, 3) * 0.1, jnp.float32),
        "mesh_3d_left": jnp.asarray(rng.randn(b, 778, 3) * 0.1, jnp.float32),
        "mesh_3d_right": jnp.asarray(rng.randn(b, 778, 3) * 0.1, jnp.float32),
        "center_left": jnp.asarray(rng.randn(b, 1, 3) * 0.1, jnp.float32),
        "center_right": jnp.asarray(rng.randn(b, 1, 3) * 0.1, jnp.float32),
        "seg": jnp.asarray(rng.randint(0, 3, (b, 256, 256))),
        "dense": jnp.asarray(rng.rand(b, 256, 256, 3), jnp.float32),
    }

    per_stage = dir_losses(outputs, targets, cfg, faces, faces)
    fused = dir_losses(outputs, targets, cfg, faces, faces,
                       fused_stages=True)
    np.testing.assert_allclose(float(total_loss(fused)),
                               float(total_loss(per_stage)), rtol=1e-5)
