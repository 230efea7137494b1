"""Numeric parity of converted torch weights vs our flax modules.

Each test builds a torch module with the reference's exact layer layout,
converts its state_dict through the table-driven converter, and checks
the flax module reproduces the torch outputs — validating every weight
transpose/mapping the released-checkpoint import relies on. A full-tree
round-trip (flax -> torch layout -> flax) proves coverage of every
parameter of the complete DIR model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from dir_tpu.train import checkpoint as ck


def _to_jax_input(x_nchw):
    return jnp.asarray(x_nchw.permute(0, 2, 3, 1).numpy())


def _sd(tmod):
    return {k: v.numpy() for k, v in tmod.state_dict().items()}


def test_conv_bn_stack_parity(rng):
    """Sequential(Conv2d, BN2d, ReLU, Conv2d) == SegDenseHead mapping."""
    tmod = nn.Sequential(
        nn.Conv2d(16, 8, 3, 1, 1), nn.BatchNorm2d(8), nn.ReLU(),
        nn.Conv2d(8, 3, 1, 1))
    tmod.eval()
    with torch.no_grad():
        tmod[1].running_mean.normal_()
        tmod[1].running_var.uniform_(0.5, 2.0)
        tmod[1].weight.normal_()
        tmod[1].bias.normal_()

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck._entries_head("", ("head",)))

    from dir_tpu.models.dir import SegDenseHead
    fmod = SegDenseHead()
    x = torch.randn(2, 16, 8, 8)
    variables = {"params": params["head"], "batch_stats": stats["head"]}
    got = np.asarray(fmod.apply(variables, _to_jax_input(x)))
    with torch.no_grad():
        want = tmod(x).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mlp1d_parity(rng):
    """Sequential(Conv1d, BN1d, ReLU, Conv1d) == MLP1d mapping."""
    tmod = nn.Sequential(
        nn.Conv1d(3, 32, 1), nn.BatchNorm1d(32), nn.ReLU(),
        nn.Conv1d(32, 32, 1))
    tmod.eval()
    with torch.no_grad():
        tmod[1].running_mean.normal_()
        tmod[1].running_var.uniform_(0.5, 2.0)

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck._entries_mlp1d("", ("emb",)))

    from dir_tpu.models.layers import MLP1d
    fmod = MLP1d(32, 32)
    x = torch.randn(2, 3, 21)  # (B, C, N) torch conv1d layout
    variables = {"params": params["emb"], "batch_stats": stats["emb"]}
    got = np.asarray(fmod.apply(variables, jnp.asarray(
        x.permute(0, 2, 1).numpy())))
    with torch.no_grad():
        want = tmod(x).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


class _TorchResidual(nn.Module):
    """Reference hourglass Residual layout (hourglass.py:33-70)."""

    def __init__(self, inp, out):
        super().__init__()

        class Conv(nn.Module):
            def __init__(self, i, o, k):
                super().__init__()
                self.conv = nn.Conv2d(i, o, k, 1, (k - 1) // 2, bias=True)

            def forward(self, x):
                return self.conv(x)

        self.bn1 = nn.BatchNorm2d(inp)
        self.conv1 = Conv(inp, out // 2, 1)
        self.bn2 = nn.BatchNorm2d(out // 2)
        self.conv2 = Conv(out // 2, out // 2, 3)
        self.bn3 = nn.BatchNorm2d(out // 2)
        self.conv3 = Conv(out // 2, out, 1)
        self.skip_layer = Conv(inp, out, 1)
        self.need_skip = inp != out

    def forward(self, x):
        res = self.skip_layer(x) if self.need_skip else x
        out = torch.relu(self.bn1(x))
        out = self.conv1(out)
        out = torch.relu(self.bn2(out))
        out = self.conv2(out)
        out = torch.relu(self.bn3(out))
        out = self.conv3(out)
        return out + res


def test_residual_parity(rng):
    tmod = _TorchResidual(16, 32)
    tmod.eval()
    for bn in (tmod.bn1, tmod.bn2, tmod.bn3):
        with torch.no_grad():
            bn.running_mean.normal_()
            bn.running_var.uniform_(0.5, 2.0)

    params, stats = ck.convert_torch_state(
        _sd(tmod), ck._entries_residual("", ("res",)))

    from dir_tpu.models.layers import Residual
    fmod = Residual(32)
    x = torch.randn(2, 16, 8, 8)
    variables = {"params": params["res"], "batch_stats": stats["res"]}
    got = np.asarray(fmod.apply(variables, _to_jax_input(x)))
    with torch.no_grad():
        want = tmod(x).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


class _TorchAttention(nn.Module):
    """Reference attention layout (mixSTE.py:52-97, comb=False)."""

    def __init__(self, dim, heads):
        super().__init__()
        self.num_heads = heads
        self.scale = (dim // heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.num_heads,
                                  C // self.num_heads).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


def test_attention_parity(rng):
    tmod = _TorchAttention(32, 4)
    tmod.eval()
    mapping = (ck._entries_dense("qkv", ("attn", "qkv"))
               + ck._entries_dense("proj", ("attn", "proj")))
    params, _ = ck.convert_torch_state(_sd(tmod), mapping)

    from dir_tpu.models.transformer import Attention
    fmod = Attention(num_heads=4)
    x = torch.randn(2, 10, 32)
    got = np.asarray(fmod.apply({"params": params["attn"]},
                                jnp.asarray(x.numpy())))
    with torch.no_grad():
        want = tmod(x).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_full_dir_roundtrip(rng):
    """flax tree -> torch-layout state_dict -> flax tree covers every
    parameter of the full DIR model with exact values."""
    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR

    cfg = ModelConfig(backbone_layers=(1, 1, 1, 1))
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)
    img = jnp.zeros((1, 256, 256, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, mano_l, mano_r))
    counter = iter(range(10 ** 9))
    variables = jax.tree.map(
        lambda s: jnp.full(s.shape, float(next(counter)), s.dtype), shapes)

    sd = ck.export_torch_dir_state(
        variables["params"], variables["batch_stats"],
        backbone_layers=cfg.backbone_layers)
    assert len(sd) > 400

    params, stats = ck.convert_torch_dir_state(
        sd, backbone_layers=cfg.backbone_layers)
    params = ck.prune_to_target(params, variables["params"])
    stats = ck.prune_to_target(stats, variables["batch_stats"])

    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), params, variables["params"])
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), stats, variables["batch_stats"])


def test_resnet50_torchvision_import():
    """Converted torchvision resnet50 weights reproduce the torch pyramid
    numerically through our NHWC backbone."""
    import pytest
    torchvision = pytest.importorskip("torchvision")

    tv = torchvision.models.resnet50()
    sd = {k: v.numpy() for k, v in tv.state_dict().items()}
    params, stats = ck.import_torch_resnet50(sd)

    from dir_tpu.models.resnet import ResNetPyramid
    mod = ResNetPyramid()
    x = jnp.asarray(np.random.RandomState(0).randn(1, 64, 64, 3)
                    .astype(np.float32))
    shapes = jax.eval_shape(lambda: mod.init(jax.random.PRNGKey(0), x))
    pruned = ck.prune_to_target(params, shapes["params"])
    pruned_stats = ck.prune_to_target(stats, shapes["batch_stats"])

    feats = mod.apply({"params": pruned, "batch_stats": pruned_stats}, x)
    tv.eval()
    with torch.no_grad():
        t = torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2))
        h = tv.maxpool(tv.relu(tv.bn1(tv.conv1(t))))
        c1 = tv.layer1(h)
        c4 = tv.layer4(tv.layer3(tv.layer2(c1)))
    np.testing.assert_allclose(
        np.asarray(feats[0]), c1.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(feats[3]), c4.permute(0, 2, 3, 1).numpy(), atol=2e-3)
