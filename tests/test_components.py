"""Shape/parity tests for the network building blocks."""

import numpy as np
import jax
import jax.numpy as jnp

from dir_tpu.models.layers import Residual, MLP1d, upsample2x
from dir_tpu.models.resnet import ResNetPyramid
from dir_tpu.models.gcn import PGraphConv, ResSimplePGCN, hand_adjacency
from dir_tpu.models.transformer import STE, Attention


def test_residual_shapes(rng):
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    mod = Residual(64)
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(vars_, x)
    assert y.shape == (2, 8, 8, 64)
    # same-channel case has no skip conv
    mod2 = Residual(32)
    vars2 = mod2.init(jax.random.PRNGKey(0), x)
    assert "skip" not in vars2["params"]
    assert mod2.apply(vars2, x).shape == (2, 8, 8, 32)


def test_resnet_pyramid_shapes(rng):
    x = jnp.asarray(rng.randn(1, 128, 128, 3).astype(np.float32))
    mod = ResNetPyramid(layers=(1, 1, 1, 1))
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    feats = mod.apply(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 32, 32, 256), (1, 16, 16, 512), (1, 8, 8, 1024), (1, 4, 4, 2048)]


def test_resnet_batchnorm_updates(rng):
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    mod = ResNetPyramid(layers=(1, 1, 1, 1))
    vars_ = mod.init(jax.random.PRNGKey(0), x, train=True)
    _, updates = mod.apply(vars_, x, train=True, mutable=["batch_stats"])
    before = vars_["batch_stats"]["bn1"]["mean"]
    after = updates["batch_stats"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def _pgc_oracle(x, w, e0, e1, adj, bias):
    """Numpy oracle for PGraphConv: masked row-softmax aggregation."""
    j = x.shape[1]
    h0 = np.einsum("bjc,jcd->bjd", x, w[0])
    h1 = np.einsum("bjc,jcd->bjd", x, w[1])
    a0 = np.full((j, j), -9e15, np.float32)
    np.fill_diagonal(a0, e0)
    a1 = np.full((j, j), -9e15, np.float32)
    a1.reshape(-1)[np.nonzero(adj.reshape(-1) > 0)[0]] = e1

    def softmax(m):
        e = np.exp(m - m.max(1, keepdims=True))
        return e / e.sum(1, keepdims=True)

    out = softmax(a0) @ h0 + softmax(a1) @ h1
    return out + bias


def test_pgraphconv_matches_oracle(rng):
    adj = hand_adjacency(21)
    x = rng.randn(2, 21, 16).astype(np.float32)
    mod = PGraphConv(8, tuple(map(tuple, adj)))
    vars_ = mod.init(jax.random.PRNGKey(1), jnp.asarray(x))
    p = jax.tree.map(np.asarray, vars_["params"])
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))
    want = _pgc_oracle(x, p["w"], p["e0"], p["e1"], adj, p["bias"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_res_simple_pgcn_shapes(rng):
    x = jnp.asarray(rng.randn(2, 21, 128).astype(np.float32))
    mod = ResSimplePGCN(128, num_layers=4)
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(vars_, x)
    assert y.shape == (2, 21, 128)
    assert len(vars_["params"]) == 4  # layer0..layer3


def test_attention_matches_numpy_oracle(rng):
    x = rng.randn(2, 10, 32).astype(np.float32)
    mod = Attention(num_heads=4)
    vars_ = mod.init(jax.random.PRNGKey(2), jnp.asarray(x))
    p = jax.tree.map(np.asarray, vars_["params"])
    got = np.asarray(mod.apply(vars_, jnp.asarray(x)))

    qkv = x @ p["qkv"]["kernel"] + p["qkv"]["bias"]
    qkv = qkv.reshape(2, 10, 3, 4, 8)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    attn = np.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(8)
    attn = np.exp(attn - attn.max(-1, keepdims=True))
    attn = attn / attn.sum(-1, keepdims=True)
    out = np.einsum("bhnm,bmhd->bnhd", attn, v).reshape(2, 10, 32)
    want = out @ p["proj"]["kernel"] + p["proj"]["bias"]
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_ste_shapes_and_skipped_block0(rng):
    x = jnp.asarray(rng.randn(2, 42, 128).astype(np.float32))
    mod = STE(num_joints=42, in_chans=128, out_dim=64, depth=4)
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(vars_, x)
    assert y.shape == (2, 42, 64)
    # depth=4 but block0 is never built (reference quirk, mixSTE.py:197)
    names = set(vars_["params"].keys())
    assert "block1" in names and "block3" in names and "block0" not in names


def test_mlp1d_and_upsample(rng):
    x = jnp.asarray(rng.randn(2, 21, 3).astype(np.float32))
    mod = MLP1d(128, 128)
    vars_ = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(vars_, x).shape == (2, 21, 128)

    img = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
    up = upsample2x(img)
    assert up.shape == (1, 16, 16, 4)
    # torch bilinear align_corners=False parity
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(np.asarray(img)).permute(0, 3, 1, 2)
    want = F.interpolate(t, scale_factor=2, mode="bilinear",
                         align_corners=False)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(up), want, atol=1e-5)


def test_hourglass_and_simple_pgcn(rng):
    from dir_tpu.models.layers import Hourglass
    from dir_tpu.models.gcn import SimplePGCN, get_hierarchy_mapping
    x = jnp.asarray(rng.randn(1, 16, 16, 32).astype(np.float32))
    hg = Hourglass(depth=2, features=32)
    v = hg.init(jax.random.PRNGKey(0), x)
    assert hg.apply(v, x).shape == (1, 16, 16, 32)

    t = jnp.asarray(rng.randn(2, 21, 8).astype(np.float32))
    gc = SimplePGCN(8, 16, 4, num_layers=2)
    v = gc.init(jax.random.PRNGKey(0), t)
    assert gc.apply(v, t).shape == (2, 21, 4)
    assert len(get_hierarchy_mapping()) == 3


def test_s2d_stem_exactly_matches_conv7(rng):
    """space-to-depth stem with converted weights == the 7x7/2 stem."""
    from dir_tpu.models.resnet import ResNetPyramid, stem_weights_to_s2d
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    m7 = ResNetPyramid(layers=(1, 1, 1, 1), stem="conv7")
    v7 = m7.init(jax.random.PRNGKey(0), x)
    ms = ResNetPyramid(layers=(1, 1, 1, 1), stem="s2d")
    vs = ms.init(jax.random.PRNGKey(0), x)

    vs = jax.tree_util.tree_map(lambda v: v, vs)  # copy structure
    params = dict(v7["params"])
    params["conv1"] = {"kernel": stem_weights_to_s2d(
        v7["params"]["conv1"]["kernel"])}
    out7 = m7.apply(v7, x)
    outs = ms.apply({"params": params,
                     "batch_stats": v7["batch_stats"]}, x)
    for a, b in zip(out7, outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_adapt_stem_s2d_tree_rewrite(rng):
    """checkpoint.adapt_stem_s2d rewrites nested conv7 stem kernels and
    leaves everything else untouched; the s2d model then reproduces the
    conv7 outputs (so imported reference checkpoints load into
    backbone_stem='s2d' models)."""
    from dir_tpu.models.resnet import ResNetPyramid
    from dir_tpu.train.checkpoint import adapt_stem_s2d

    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    m7 = ResNetPyramid(layers=(1, 1, 1, 1), stem="conv7")
    v7 = m7.init(jax.random.PRNGKey(0), x)
    tree = {"backbone": dict(v7["params"]), "other": {"w": jnp.ones(3)}}
    adapted = adapt_stem_s2d(tree)
    assert adapted["backbone"]["conv1"]["kernel"].shape == (4, 4, 12, 64)
    np.testing.assert_array_equal(np.asarray(adapted["other"]["w"]),
                                  np.ones(3))

    ms = ResNetPyramid(layers=(1, 1, 1, 1), stem="s2d")
    out7 = m7.apply(v7, x)
    outs = ms.apply({"params": adapted["backbone"],
                     "batch_stats": v7["batch_stats"]}, x)
    for a, b in zip(out7, outs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_max_pool_3x3_s2_matches_reduce_window(rng):
    """ops/pool.py shifted-slice maxpool == flax nn.max_pool (fwd+grad)."""
    import flax.linen as nn

    from dir_tpu.ops.pool import max_pool_3x3_s2

    x = jnp.asarray(rng.randn(2, 16, 12, 5).astype(np.float32))
    ref = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    got = max_pool_3x3_s2(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    g_ref = jax.grad(lambda v: (nn.max_pool(
        v, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))) ** 2).sum())(x)
    g_got = jax.grad(lambda v: (max_pool_3x3_s2(v) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               atol=1e-6)


def test_bn_stat_barrier_is_identity(rng, monkeypatch):
    """The BN_BARRIER perf experiment (layers.stat_barrier) must not
    change numerics: optimization_barrier is the identity, so forward
    outputs, BN stat updates, and gradients match the unbarriered path
    exactly on CPU (same op order, only fusion boundaries differ)."""
    import dir_tpu.models.layers as L
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    mod = Residual(16)
    vars_ = mod.init(jax.random.PRNGKey(0), x, train=True)

    def run():
        y, upd = mod.apply(vars_, x, train=True, mutable=["batch_stats"])
        g = jax.grad(lambda p: mod.apply(
            {"params": p, "batch_stats": vars_["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])[0].sum())(vars_["params"])
        return y, upd["batch_stats"], g

    monkeypatch.setattr(L, "_BN_BARRIER", 0)
    y0, s0, g0 = run()
    monkeypatch.setattr(L, "_BN_BARRIER", 1)  # threshold 1 = everywhere
    y1, s1, g1 = run()
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    for a, b in zip(jax.tree.leaves(s0), jax.tree.leaves(s1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_residual_pair_matches_concat(rng, monkeypatch):
    """Residual(x, pair=y) == Residual(concat([x, y])) on the SAME
    parameters — forward, BN batch-stat updates, and input gradients,
    in train and eval modes. The pair path splits bn1/conv1/skip per
    channel range (exact algebra, no materialized concat); the
    parameter trees are identical by construction. _PAIR_FUSION is
    pinned to 2 (always) so the train-mode pair algebra is exercised
    even though production defaults to eval-only."""
    from dir_tpu.models import layers as L
    monkeypatch.setattr(L, "_PAIR_FUSION", 2)
    a = jnp.asarray(rng.randn(2, 8, 8, 5).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 8, 8, 3).astype(np.float32))
    cat = jnp.concatenate([a, b], axis=-1)
    mod = Residual(6)

    v_cat = mod.init(jax.random.PRNGKey(0), cat, train=True)
    v_pair = mod.init(jax.random.PRNGKey(0), a, train=True, pair=b)
    assert (jax.tree.structure(v_cat) == jax.tree.structure(v_pair))
    for l1, l2 in zip(jax.tree.leaves(v_cat), jax.tree.leaves(v_pair)):
        assert l1.shape == l2.shape and l1.dtype == l2.dtype

    for train in (False, True):
        y0, upd0 = mod.apply(v_cat, cat, train=train,
                             mutable=["batch_stats"])
        y1, upd1 = mod.apply(v_cat, a, train=train, pair=b,
                             mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                                   rtol=1e-6, atol=1e-6)
        for s0, s1 in zip(jax.tree.leaves(upd0), jax.tree.leaves(upd1)):
            np.testing.assert_allclose(np.asarray(s1), np.asarray(s0),
                                       rtol=1e-6, atol=1e-6)

    g0 = jax.grad(lambda v: (mod.apply(
        v, cat, train=True, mutable=["batch_stats"])[0] ** 2).sum())(
            {"params": v_cat["params"], "batch_stats": v_cat["batch_stats"]})
    g1 = jax.grad(lambda v: (mod.apply(
        v, a, train=True, pair=b, mutable=["batch_stats"])[0] ** 2).sum())(
            {"params": v_cat["params"], "batch_stats": v_cat["batch_stats"]})
    for l0, l1 in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        # atol 2e-4: BN scale/bias grads of near-centered outputs are
        # catastrophic cancellations (values ~1e-5); the two summation
        # orders legitimately differ there at the 6e-5 level while every
        # O(1) leaf matches to 1e-5 relative.
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l0),
                                   rtol=1e-5, atol=2e-4)
