"""Parity tests against the ACTUAL reference torch code.

Unlike test_torch_parity.py (which checks the converter against torch
modules re-built with the same layout), these tests import the reference
source from /root/reference itself — so a shared misreading of the
reference cannot pass. See tests/reference_oracle.py for the import
stubs (only unavailable third-party deps are stubbed, never math).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn as nn

from dir_tpu.train import checkpoint as ck

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
import reference_oracle as oracle  # noqa: E402

oracle.install()


def _randomize_bn_stats(module: nn.Module, rng: np.random.RandomState):
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.copy_(torch.from_numpy(
                    rng.randn(*m.running_mean.shape).astype(np.float32)))
                m.running_var.copy_(torch.from_numpy(
                    rng.uniform(0.5, 2.0, m.running_var.shape)
                    .astype(np.float32)))
                if m.weight is not None:
                    m.weight.copy_(torch.from_numpy(
                        rng.randn(*m.weight.shape).astype(np.float32) * 0.2
                        + 1.0))
                    m.bias.copy_(torch.from_numpy(
                        rng.randn(*m.bias.shape).astype(np.float32) * 0.2))


def _sd(tmod):
    return {k: v.detach().numpy() for k, v in tmod.state_dict().items()}


# ---------------------------------------------------------------------------
# bone_proj / lineseg_dists (models/dir.py:132-174)
# ---------------------------------------------------------------------------

def test_ref_bone_proj(rng):
    from models.dir import Joint2BoneFeature

    S, B, C = 16, 3, 8
    ref = object.__new__(Joint2BoneFeature)  # skip heavy __init__
    ref.bone_num = 20
    ref.parent = torch.tensor(
        [0, 1, 2, 3, 0, 5, 6, 7, 0, 9, 10, 11, 0, 13, 14, 15, 0, 17, 18, 19])
    ref.child = torch.tensor(
        [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
         20])
    x = torch.arange(S) + 0.5
    gx, gy = torch.meshgrid(x, x, indexing="ij")
    ref.img_gird = torch.stack((gy, gx), -1).reshape(S * S, 2)
    ref.feature_size = S
    ref.distance = 2.0

    uv = torch.from_numpy(rng.uniform(-0.9, 0.9, (B, 21, 2))
                          .astype(np.float32))
    feat = torch.from_numpy(rng.randn(B, 21, C).astype(np.float32))
    with torch.no_grad():
        want = Joint2BoneFeature.bone_proj(ref, uv, feat)  # (B, 20C, S, S)

    from dir_tpu.ops.bone_splat import bone_splat
    got = bone_splat(jnp.asarray(uv.numpy()), jnp.asarray(feat.numpy()),
                     size=S, distance=2.0)  # (B, S, S, 20C)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), atol=1e-5)


def test_ref_lineseg_dists(rng):
    from models.dir import Joint2BoneFeature

    ref = object.__new__(Joint2BoneFeature)
    p = torch.from_numpy(rng.uniform(0, 16, (64, 2)).astype(np.float32))
    a = torch.from_numpy(rng.uniform(0, 16, (64, 2)).astype(np.float32))
    b = torch.from_numpy(rng.uniform(0, 16, (64, 2)).astype(np.float32))
    with torch.no_grad():
        want = Joint2BoneFeature.lineseg_dists(ref, p, a, b).numpy()

    # The jnp math lives fused inside bone_splat; recompute it standalone
    # with the same formula to pin the geometry.
    import jax.numpy as j
    pj, aj, bj = (jnp.asarray(t.numpy()) for t in (p, a, b))
    d_ba = bj - aj
    d = d_ba / jnp.hypot(d_ba[:, 0], d_ba[:, 1])[:, None]
    s = jnp.sum((aj - pj) * d, axis=1)
    t = jnp.sum((pj - bj) * d, axis=1)
    h = jnp.maximum(jnp.maximum(s, t), 0.0)
    d_pa = pj - aj
    c = d_pa[:, 0] * d[:, 1] - d_pa[:, 1] * d[:, 0]
    got = np.asarray(jnp.hypot(h, c))
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# STE transformer (transformer/mixSTE.py:158-205)
# ---------------------------------------------------------------------------

def test_ref_ste_parity(rng):
    from transformer.mixSTE import STE as RefSTE

    tmod = RefSTE(num_joints=42, in_chans=32, out_dim=16, depth=4,
                  num_heads=4)
    with torch.no_grad():
        tmod.spatial_pos_embed.copy_(
            torch.from_numpy(rng.randn(1, 42, 32).astype(np.float32) * 0.1))
    tmod.eval()

    params, _ = ck.convert_torch_state(
        _sd(tmod), ck._entries_ste("", ("ste",)))

    from dir_tpu.models.transformer import STE
    fmod = STE(num_joints=42, in_chans=32, out_dim=16, depth=4, num_heads=4)
    x = torch.from_numpy(rng.randn(2, 42, 32).astype(np.float32))
    got = np.asarray(fmod.apply({"params": params["ste"]},
                                jnp.asarray(x.numpy())))
    with torch.no_grad():
        want = tmod(x.clone()).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# SemGCN (SemGCN/p_gcn.py:63-73 + p_graph_conv.py)
# ---------------------------------------------------------------------------

def test_ref_gcn_parity(rng):
    from SemGCN.p_gcn import ResSimplePGCN as RefGCN
    from SemGCN.utils import adj_mx_from_edges, get_sketch_setting

    adj = adj_mx_from_edges(21, get_sketch_setting(), sparse=False,
                            eye=False)
    tmod = RefGCN(adj, 32, num_layers=4)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck._entries_gcn("", ("gcn",)))

    from dir_tpu.models.gcn import ResSimplePGCN, hand_adjacency
    fmod = ResSimplePGCN(hidden_dim=32, num_layers=4,
                         adjacency=tuple(map(tuple, hand_adjacency(21))))
    x = torch.from_numpy(rng.randn(2, 21, 32).astype(np.float32))
    got = np.asarray(fmod.apply(
        {"params": params["gcn"], "batch_stats": stats["gcn"]},
        jnp.asarray(x.numpy())))
    with torch.no_grad():
        want = tmod(x).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ref_adjacency_matches():
    """Our binary adjacency masks the same entries the reference's
    normalized adjacency does (only the nonzero pattern matters,
    p_graph_conv.py:27-28)."""
    from SemGCN.utils import adj_mx_from_edges, get_sketch_setting

    from dir_tpu.models.gcn import hand_adjacency

    ref = adj_mx_from_edges(21, get_sketch_setting(), sparse=False,
                            eye=False).numpy()
    np.testing.assert_array_equal(ref > 0, hand_adjacency(21) > 0)


def test_ref_hierarchy_graphs():
    """Hierarchical coarsening graphs + node maps (SemGCN/utils.py:74-99)
    match our gcn.get_hierarchy_sketch / get_hierarchy_mapping."""
    from SemGCN.utils import get_hierarchy_mapping, get_hierarchy_sketch

    from dir_tpu.models import gcn

    ref_sketch = get_hierarchy_sketch()
    got_sketch = gcn.get_hierarchy_sketch()
    assert len(ref_sketch) == len(got_sketch) == 4
    for r, g in zip(ref_sketch, got_sketch):
        assert [list(e) for e in g] == [list(e) for e in r]
    ref_maps = get_hierarchy_mapping()
    got_maps = gcn.get_hierarchy_mapping()
    assert len(ref_maps) == len(got_maps) == 3
    for r, g in zip(ref_maps, got_maps):
        assert [list(m) for m in g] == [list(m) for m in r]


def test_ref_pool_gcn_parity(rng):
    """SimplePoolGCN (SemGCN/p_gcn.py:76-128) == our flax SimplePoolGCN
    with converted weights. Dead code in the reference (no construction
    site) — adjacency built the way DIR builds its graphs
    (models/dir.py:23: eye=False)."""
    from SemGCN.p_gcn import SimplePoolGCN as RefPool
    from SemGCN.utils import (adj_mx_from_edges, get_hierarchy_mapping,
                              get_hierarchy_sketch)

    sketches = get_hierarchy_sketch()
    maps = get_hierarchy_mapping()
    adjs = [adj_mx_from_edges(n, e, sparse=False, eye=False)
            for n, e in zip((21, 11, 6), sketches)]
    tmod = RefPool(adjs, maps, in_dim=16, hid_dim=(24, 32, 40), out_dim=8)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck._entries_pool_gcn("", ("pg",)))

    from dir_tpu.models.gcn import SimplePoolGCN
    fmod = SimplePoolGCN(hid_dims=(24, 32, 40), out_dim=8)
    x = torch.from_numpy(rng.randn(2, 21, 16).astype(np.float32))
    got = np.asarray(fmod.apply(
        {"params": params["pg"], "batch_stats": stats["pg"]},
        jnp.asarray(x.numpy())))
    with torch.no_grad():
        want = tmod(x).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ref_hourglass_parity(rng):
    """Recursive Hourglass (models/backbone/hourglass.py:73-97) == our
    flax Hourglass with converted weights (dead code in the reference —
    constructed nowhere in the DIR pipeline)."""
    from models.backbone.hourglass import Hourglass as RefHG

    tmod = RefHG(n=2, f=16)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck._entries_hourglass("", ("hg",), depth=2))

    from dir_tpu.models.layers import Hourglass
    fmod = Hourglass(depth=2, features=16)
    x = torch.from_numpy(rng.randn(1, 16, 16, 16).astype(np.float32))
    xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    shapes = jax.eval_shape(lambda: fmod.init(jax.random.PRNGKey(0), xj))
    params = ck.prune_to_target(params["hg"], shapes["params"])
    stats = ck.prune_to_target(stats["hg"], shapes["batch_stats"])
    got = np.asarray(fmod.apply(
        {"params": params, "batch_stats": stats}, xj))
    with torch.no_grad():
        want = tmod(x).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# Losses (models/loss.py, models/lovasz_loss.py)
# ---------------------------------------------------------------------------

def test_ref_smooth_l1(rng):
    from models.loss import SmoothL1Loss

    tmod = SmoothL1Loss()
    x = torch.from_numpy((rng.randn(4, 21, 3) * 0.1).astype(np.float32))
    y = torch.from_numpy((rng.randn(4, 21, 3) * 0.1).astype(np.float32))
    with torch.no_grad():
        want = tmod(x, y).numpy()

    from dir_tpu.models.losses import smooth_l1
    got = np.asarray(smooth_l1(jnp.asarray(x.numpy()),
                               jnp.asarray(y.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_ref_normal_edge_losses(rng):
    from models.loss import EdgeLengthLoss, NormalVectorLoss

    faces = np.stack([np.random.RandomState(7).choice(50, 3, replace=False)
                      for _ in range(30)]).astype(np.int64)
    pred = torch.from_numpy((rng.randn(2, 50, 3) * 0.1).astype(np.float32))
    gt = torch.from_numpy((rng.randn(2, 50, 3) * 0.1).astype(np.float32))

    with torch.no_grad():
        want_n = NormalVectorLoss(faces)(pred, gt).mean().numpy()
        want_e = EdgeLengthLoss(faces)(pred, gt).mean().numpy()

    from dir_tpu.models.losses import edge_length_loss, normal_vector_loss
    fj = jnp.asarray(faces.astype(np.int32))
    got_n = np.asarray(normal_vector_loss(
        jnp.asarray(pred.numpy()), jnp.asarray(gt.numpy()), fj))
    got_e = np.asarray(edge_length_loss(
        jnp.asarray(pred.numpy()), jnp.asarray(gt.numpy()), fj))
    np.testing.assert_allclose(got_n, want_n, atol=1e-5)
    np.testing.assert_allclose(got_e, want_e, atol=1e-5)


def test_ref_lovasz_softmax(rng):
    from models.lovasz_loss import lovasz_softmax as ref_lovasz

    # The reference feeds RAW LOGITS (models/dir.py:569) — replicate.
    logits = torch.from_numpy(rng.randn(2, 3, 8, 8).astype(np.float32))
    labels = torch.from_numpy(rng.randint(0, 3, (2, 8, 8)).astype(np.int64))
    with torch.no_grad():
        want = ref_lovasz(logits, labels).numpy()

    from dir_tpu.models.losses import lovasz_softmax
    got = np.asarray(lovasz_softmax(
        jnp.asarray(logits.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(labels.numpy().astype(np.int32))))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_ref_lovasz_missing_class(rng):
    """Class absent from the batch — the reference skips it in the mean
    (lovasz_loss.py:172-176)."""
    from models.lovasz_loss import lovasz_softmax as ref_lovasz

    logits = torch.from_numpy(rng.randn(1, 3, 8, 8).astype(np.float32))
    labels = torch.from_numpy(
        rng.randint(0, 2, (1, 8, 8)).astype(np.int64))  # no class 2
    with torch.no_grad():
        want = ref_lovasz(logits, labels).numpy()

    from dir_tpu.models.losses import lovasz_softmax
    got = np.asarray(lovasz_softmax(
        jnp.asarray(logits.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(labels.numpy().astype(np.int32))))
    np.testing.assert_allclose(got, want, atol=1e-5)


# ---------------------------------------------------------------------------
# Backbone (models/backbone/resnet.py:143-258) — replaces the skipped
# torchvision import test: same layer layout, run from random weights.
# ---------------------------------------------------------------------------

def test_ref_backbone_parity(rng):
    from models.backbone.resnet import resnet50 as ref_resnet50

    tmod = ref_resnet50()
    _randomize_bn_stats(tmod, rng)
    tmod.eval()

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck.resnet_mapping("", ("",)))

    from dir_tpu.models.resnet import ResNetPyramid
    fmod = ResNetPyramid()
    x = torch.from_numpy(rng.randn(1, 3, 64, 64).astype(np.float32))
    feats = fmod.apply({"params": params[""], "batch_stats": stats[""]},
                       jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    with torch.no_grad():
        want = tmod(x)
    for lvl, (got_f, want_f) in enumerate(zip(feats, want)):
        w = want_f.permute(0, 2, 3, 1).numpy()
        scale = np.abs(w).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(got_f) / scale, w / scale, atol=3e-6,
            err_msg=f"pyramid level {lvl}")


def test_ref_backbone_parity_resnet18(rng):
    """BasicBlock variant (reference resnet.py:36-83, 271-273): vendored
    by the reference but unused by DIR; covered for constructor-surface
    parity."""
    from models.backbone.resnet import resnet18 as ref_resnet18

    tmod = ref_resnet18()
    _randomize_bn_stats(tmod, rng)
    tmod.eval()

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck.resnet_mapping("", ("",), layers=(2, 2, 2, 2),
                                     block="basic"))

    from dir_tpu.models.resnet import resnet18
    fmod = resnet18()
    x = torch.from_numpy(rng.randn(1, 3, 64, 64).astype(np.float32))
    feats = fmod.apply({"params": params[""], "batch_stats": stats[""]},
                       jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    with torch.no_grad():
        want = tmod(x)
    for lvl, (got_f, want_f) in enumerate(zip(feats, want)):
        w = want_f.permute(0, 2, 3, 1).numpy()
        scale = np.abs(w).max() + 1e-6
        np.testing.assert_allclose(
            np.asarray(got_f) / scale, w / scale, atol=3e-6,
            err_msg=f"pyramid level {lvl}")


# ---------------------------------------------------------------------------
# Full DIR network on synthetic MANO assets (models/dir.py:486-596)
# ---------------------------------------------------------------------------

def test_ref_full_dir_forward(rng):
    """End-to-end: reference DIR (real torch code, real manopth math,
    synthetic MANO arrays) == our DIR with converted weights."""
    oracle.patch_manopth_synthetic()
    from models.dir import DIR as RefDIR

    torch.manual_seed(25)
    tmod = RefDIR(21, "/nonexistent/mano", root_joint=0)
    _randomize_bn_stats(tmod, rng)
    tmod.eval()

    params, stats = ck.convert_torch_dir_state(_sd(tmod))

    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
    from dir_tpu.models.dir import DIR

    cfg = ModelConfig()
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)
    img = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32))
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, mano_l, mano_r))
    params = ck.prune_to_target(params, shapes["params"])
    stats = ck.prune_to_target(stats, shapes["batch_stats"])

    out = jax.jit(
        lambda v, x: model.apply(v, x, mano_l, mano_r, train=False)
    )({"params": params, "batch_stats": stats}, img)

    with torch.no_grad():
        timg = torch.from_numpy(np.asarray(img).transpose(0, 3, 1, 2))
        outs_list, _ = tmod({"img": timg}, None, None)

    # Stages: reference outs_list[0..2] are init + 2 refinements; [3] is
    # the seg/dense dict.
    for s, stage in enumerate(out["stages"]):
        ref_out = outs_list[s]
        for key, tol in (("pd_joint_xyz_left", 5e-4),
                         ("pd_joint_xyz_right", 5e-4),
                         ("pd_mesh_xyz_left", 5e-4),
                         ("pd_mesh_xyz_right", 5e-4),
                         ("pd_joint_uv_left", 5e-3),
                         ("pd_joint_uv_right", 5e-3),
                         ("pd_offset", 5e-4)):
            got = np.asarray(stage[key])
            want = ref_out[key].numpy()
            np.testing.assert_allclose(
                got, want, atol=tol,
                err_msg=f"stage {s} key {key}")
    # Randomized BN scales inflate head activations to ~1e4; compare
    # scale-normalized (like the backbone test).
    for key in ("seg", "dense"):
        want = outs_list[3][key].permute(0, 2, 3, 1).numpy()
        scale = np.abs(want).max() + 1e-6
        np.testing.assert_allclose(np.asarray(out[key]) / scale,
                                   want / scale, atol=5e-5, err_msg=key)


def test_ref_training_loss_assembly(rng):
    """The last oracle gap (VERDICT r3): execute the reference's
    training-mode forward — the REAL ``DIR.forward(input, target,
    meta_info)`` loss block (models/dir.py:541-594) — and assert every
    term of its loss dict against dir_losses on converted weights, in
    both per-stage and fused-stage variants. Covers the x10/x1/x0.1
    weights, the (xyz-center)/0.15 GT normalization, the nearest-seg /
    bilinear-dense downsamples (dir.py:565-566) and the offset
    definition by execution rather than by reading."""
    oracle.patch_manopth_synthetic()
    from models.dir import DIR as RefDIR

    torch.manual_seed(25)
    tmod = RefDIR(21, "/nonexistent/mano", root_joint=0)
    _randomize_bn_stats(tmod, rng)
    tmod.train()  # training mode: BN uses batch stats, loss block runs

    params, stats = ck.convert_torch_dir_state(_sd(tmod))

    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
    from dir_tpu.models.dir import DIR
    from dir_tpu.models.losses import dir_losses, total_loss

    cfg = ModelConfig()
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)

    b = 2
    batch = {
        "img": rng.randn(b, 256, 256, 3).astype(np.float32),
        "joint_2d_left": rng.uniform(-1, 1, (b, 21, 3)).astype(np.float32),
        "joint_2d_right": rng.uniform(-1, 1, (b, 21, 3)).astype(np.float32),
        "mesh_2d_left": rng.uniform(-1, 1, (b, 778, 3)).astype(np.float32),
        "mesh_2d_right": rng.uniform(-1, 1, (b, 778, 3)).astype(np.float32),
        "joint_3d_left": (rng.randn(b, 21, 3) * 0.05).astype(np.float32),
        "joint_3d_right": (rng.randn(b, 21, 3) * 0.05).astype(np.float32),
        "mesh_3d_left": (rng.randn(b, 778, 3) * 0.05).astype(np.float32),
        "mesh_3d_right": (rng.randn(b, 778, 3) * 0.05).astype(np.float32),
        "center_left": (rng.randn(b, 1, 3) * 0.05).astype(np.float32),
        "center_right": (rng.randn(b, 1, 3) * 0.05).astype(np.float32),
        "seg": rng.randint(0, 3, size=(b, 256, 256)).astype(np.int32),
        "dense": rng.rand(b, 256, 256, 3).astype(np.float32),
    }

    # --- reference: train-mode forward computes the loss dict ---------
    t = {k: torch.from_numpy(v) for k, v in batch.items()}
    ref_input = {"img": t["img"].permute(0, 3, 1, 2).contiguous()}
    ref_target = {
        **{k: t[k] for k in (
            "joint_2d_left", "joint_2d_right", "mesh_2d_left",
            "mesh_2d_right", "joint_3d_left", "joint_3d_right",
            "mesh_3d_left", "mesh_3d_right")},
        # reference layout: seg (B,1,H,W) float for nearest interpolate
        # then .long(); dense NCHW (dir.py:563-566)
        "seg": t["seg"].float().unsqueeze(1),
        "dense": t["dense"].permute(0, 3, 1, 2).contiguous(),
    }
    ref_meta = {"center_left": t["center_left"],
                "center_right": t["center_right"]}
    with torch.no_grad():
        _, ref_loss = tmod(ref_input, ref_target, ref_meta)
    ref_loss = {k: float(v) for k, v in ref_loss.items()}
    assert len(ref_loss) == 3 + 3 * 13  # seg/dense/lovasz + 13 x stage

    # --- ours: converted weights, train=True forward + dir_losses -----
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jb["img"][:1], mano_l,
                           mano_r))
    params = ck.prune_to_target(params, shapes["params"])
    stats = ck.prune_to_target(stats, shapes["batch_stats"])

    @jax.jit
    def losses_fn(v, batch):
        out, _ = model.apply(v, batch["img"], mano_l, mano_r, train=True,
                             mutable=["batch_stats"])
        per_stage = dir_losses(out, batch, cfg, mano_l.faces, mano_r.faces)
        fused = dir_losses(out, batch, cfg, mano_l.faces, mano_r.faces,
                           fused_stages=True)
        return per_stage, fused

    per_stage, fused = jax.device_get(
        losses_fn({"params": params, "batch_stats": stats}, jb))

    # every reference term, by its own key (identical naming scheme)
    assert set(ref_loss) == set(per_stage)
    for k, want in sorted(ref_loss.items()):
        got = float(per_stage[k])
        np.testing.assert_allclose(
            got, want, rtol=2e-3, atol=2e-4,
            err_msg=f"loss term {k}: ours {got} vs reference {want}")

    # fused-stage variant: each *_all aggregate == sum of the
    # reference's per-stage terms; totals match (train.py:69 sums all)
    for base in ("joint_left_uv", "joint_right_uv", "mesh_left_uv",
                 "mesh_right_uv", "joint_left_xyz", "joint_right_xyz",
                 "mesh_left_xyz", "mesh_right_xyz", "edge_left",
                 "edge_right", "normal_left", "normal_right", "offset"):
        want = sum(ref_loss[f"{base}_{i}"] for i in range(3))
        np.testing.assert_allclose(
            float(fused[f"{base}_all"]), want, rtol=2e-3, atol=3e-4,
            err_msg=f"fused aggregate {base}_all")
    np.testing.assert_allclose(
        float(total_loss(fused)), sum(ref_loss.values()), rtol=2e-3)


def test_ref_dense_seg_downsample(rng):
    """Focused oracle for the GT downsamples in the loss block
    (dir.py:565-566): the end-to-end loss-term comparison can mask a
    wrong gt_dense (randomized-BN predictions dwarf a 0.5 GT shift
    inside a SmoothL1 mean), so compare the downsampled GT tensors
    themselves against torch. Caught: jax.image.resize defaults to
    antialias=True; torch bilinear does not antialias (maxdiff 0.47)."""
    import torch.nn.functional as F

    dense = rng.rand(2, 256, 256, 3).astype(np.float32)
    seg = rng.randint(0, 3, size=(2, 256, 256)).astype(np.int32)

    want_dense = F.interpolate(
        torch.from_numpy(dense).permute(0, 3, 1, 2), (32, 32),
        mode="bilinear").permute(0, 2, 3, 1).numpy()
    want_seg = F.interpolate(
        torch.from_numpy(seg.astype(np.float32)).unsqueeze(1), (32, 32),
        mode="nearest").long().squeeze(1).numpy()

    got_dense = np.asarray(jax.image.resize(
        jnp.asarray(dense), (2, 32, 32, 3), method="linear",
        antialias=False))
    got_seg = np.asarray(jnp.asarray(seg)[:, ::8, ::8])

    np.testing.assert_allclose(got_dense, want_dense, atol=1e-6)
    np.testing.assert_array_equal(got_seg, want_seg)
