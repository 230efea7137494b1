"""Fused bottleneck inference kernel vs the flax Bottleneck (oracle).

Runs the Pallas kernel in interpret mode on CPU and compares against
the unfused flax module with BatchNorm running statistics — the exact
path the kernel replaces at inference (resnet.py Bottleneck,
reference models/backbone/resnet.py:59-82).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dir_tpu.models.resnet import Bottleneck
from dir_tpu.ops.pallas_bottleneck import fold_bn, fused_bottleneck_infer


def _fold_from_variables(variables, names=("conv1", "conv2", "conv3"),
                         bns=("bn1", "bn2", "bn3")):
    p = variables["params"]
    s = variables["batch_stats"]
    out = []
    for cn, bn in zip(names, bns):
        k = p[cn]["kernel"]
        w, b = fold_bn(k, p[bn]["scale"], p[bn]["bias"],
                       s[bn]["mean"], s[bn]["var"])
        out.append((w, b))
    return out


def _rand_variables(rng, variables):
    """Random params + non-trivial BN stats (zeros would mask bugs).
    Conv kernels get xavier-ish scale so activations stay O(1) through
    the stack (unscaled uniforms explode to ~1e5 over four stages and
    drown the comparison in accumulation-order noise)."""
    leaves, treedef = jax.tree.flatten(variables)
    new = []
    for leaf in leaves:
        if leaf.ndim == 1:
            arr = rng.uniform(0.5, 1.0, size=leaf.shape)
        else:
            fan_in = int(np.prod(leaf.shape[:-1]))
            arr = rng.uniform(-1.0, 1.0, size=leaf.shape) / np.sqrt(fan_in)
        new.append(jnp.asarray(arr.astype(leaf.dtype)))
    return jax.tree.unflatten(treedef, new)


@pytest.mark.parametrize("down", [False, True])
def test_fused_bottleneck_matches_flax(down):
    rng = np.random.RandomState(0)
    c, mid = 32, 8
    block = Bottleneck(mid, stride=1, downsample=down, expansion=c // mid)
    x = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = _rand_variables(rng, variables)

    ref = block.apply(variables, x, train=False)

    (w1, b1), (w2, b2), (w3, b3) = _fold_from_variables(variables)
    w1 = w1[0, 0]
    w3 = w3[0, 0]
    if down:
        wd, bd = fold_bn(variables["params"]["down_conv"]["kernel"],
                         variables["params"]["down_bn"]["scale"],
                         variables["params"]["down_bn"]["bias"],
                         variables["batch_stats"]["down_bn"]["mean"],
                         variables["batch_stats"]["down_bn"]["var"])
        wd = wd[0, 0]
    else:
        wd = bd = None
    out = fused_bottleneck_infer(x, w1, b1, w2, b2, w3, b3, wd, bd,
                                 interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_fused_bottleneck_bf16_close():
    rng = np.random.RandomState(1)
    c, mid = 32, 8
    block = Bottleneck(mid, stride=1, downsample=False,
                       expansion=c // mid, dtype=jnp.bfloat16)
    x32 = rng.randn(2, 8, 8, c).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x32))
    variables = _rand_variables(rng, variables)
    ref = block.apply(variables, jnp.asarray(x32), train=False)

    (w1, b1), (w2, b2), (w3, b3) = _fold_from_variables(variables)
    out = fused_bottleneck_infer(jnp.asarray(x32).astype(jnp.bfloat16),
                                 w1[0, 0], b1, w2, b2, w3[0, 0], b3,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_backbone_fused_eval_matches_unfused(monkeypatch):
    """ResNetPyramid(fused_eval=True) == the XLA path at inference
    (fp32, interpret mode). layers=(2,1,1,1): layer1_0's input is the
    64-ch pool (guard keeps it XLA) but layer1_1 sees 256 ch at 64^2,
    so the fused kernel must actually run — asserted via a call
    counter, so this can't silently degrade to XLA-vs-XLA."""
    from dir_tpu.models.resnet import ResNetPyramid
    from dir_tpu.ops import pallas_bottleneck as pb

    calls = []
    real = pb.fused_bottleneck_infer
    monkeypatch.setattr(
        pb, "fused_bottleneck_infer",
        lambda *a, **k: calls.append(1) or real(*a, **k))

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 256, 256, 3).astype(np.float32))
    plain = ResNetPyramid(layers=(2, 1, 1, 1))
    fused = ResNetPyramid(layers=(2, 1, 1, 1), fused_eval=True)
    variables = plain.init(jax.random.PRNGKey(0), x)
    variables = _rand_variables(np.random.RandomState(3), variables)

    ref = plain.apply(variables, x, train=False)
    out = fused.apply(variables, x, train=False)
    assert len(calls) == 1, "fused kernel did not engage"
    # random un-normalized weights blow activations up to ~1e3 over four
    # stages, amplifying fp32 accumulation-order differences; 2e-3
    # relative is tight for that scale
    for r, o in zip(ref, out):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r),
                                   rtol=2e-3, atol=2e-3)


def test_fused_stem_bottleneck_matches_flax():
    """stem kernel == BN-affine + relu + max_pool + Bottleneck(proj)
    (fp32, interpret mode)."""
    import flax.linen as nn

    from dir_tpu.ops.pallas_bottleneck import fused_stem_bottleneck

    rng = np.random.RandomState(4)
    c, mid, o = 32, 8, 32
    block = Bottleneck(mid, stride=1, downsample=True,
                       expansion=o // mid)
    x = jnp.asarray(rng.randn(2, 16, 16, c).astype(np.float32))
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    t1 = jnp.asarray(rng.uniform(-0.5, 0.5, c).astype(np.float32))

    pooled_ref = nn.max_pool(jax.nn.relu(x * g1 + t1), (3, 3),
                             strides=(2, 2), padding=((1, 1), (1, 1)))
    variables = block.init(jax.random.PRNGKey(0), pooled_ref)
    variables = _rand_variables(np.random.RandomState(5), variables)
    ref = block.apply(variables, pooled_ref, train=False)

    (w1, b1), (w2, b2), (w3, b3) = _fold_from_variables(variables)
    wd, bd = fold_bn(variables["params"]["down_conv"]["kernel"],
                     variables["params"]["down_bn"]["scale"],
                     variables["params"]["down_bn"]["bias"],
                     variables["batch_stats"]["down_bn"]["mean"],
                     variables["batch_stats"]["down_bn"]["var"])
    out = fused_stem_bottleneck(x, g1, t1, w1[0, 0], b1, w2, b2,
                                w3[0, 0], b3, wd[0, 0], bd,
                                interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("down", [False, True])
def test_fused_bottleneck_banded_matches_flax(down):
    """Row-banded scheduling (_kernel_banded, the layer2 path) == the
    XLA block, interpret mode."""
    rng = np.random.RandomState(3)
    c, mid = 32, 8
    block = Bottleneck(mid, stride=1, downsample=down, expansion=c // mid)
    x = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = _rand_variables(rng, variables)

    ref = block.apply(variables, x, train=False)

    (w1, b1), (w2, b2), (w3, b3) = _fold_from_variables(variables)
    w1 = w1[0, 0]
    w3 = w3[0, 0]
    if down:
        wd, bd = fold_bn(variables["params"]["down_conv"]["kernel"],
                         variables["params"]["down_bn"]["scale"],
                         variables["params"]["down_bn"]["bias"],
                         variables["batch_stats"]["down_bn"]["mean"],
                         variables["batch_stats"]["down_bn"]["var"])
        wd = wd[0, 0]
    else:
        wd = bd = None
    out = fused_bottleneck_infer(x, w1, b1, w2, b2, w3, b3, wd, bd,
                                 interpret=True, bands=4)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_backbone_fused_layer2_banded_guard(monkeypatch):
    """With FUSED_L2_BANDS set, the Bottleneck guard engages the
    row-banded kernel at the layer2 shape (spatial 1024, 512 ch) and
    matches the XLA path; with it unset (default) layer2 stays XLA."""
    from dir_tpu.models import resnet as rn
    from dir_tpu.ops import pallas_bottleneck as pb

    calls = []
    real = pb.fused_bottleneck_infer
    monkeypatch.setattr(
        pb, "fused_bottleneck_infer",
        lambda *a, **k: calls.append(k.get("bands", 0)) or real(*a, **k))

    rng = np.random.RandomState(6)
    c, mid = 512, 128
    block = rn.Bottleneck(mid, stride=1, downsample=False,
                          expansion=c // mid, fused_eval=True)
    x = jnp.asarray(rng.randn(1, 32, 32, c).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = _rand_variables(np.random.RandomState(7), variables)

    monkeypatch.setattr(rn, "_FUSED_L2_BANDS", 0)
    ref = block.apply(variables, x, train=False)
    assert calls == [], "layer2 shape must stay XLA by default"

    monkeypatch.setattr(rn, "_FUSED_L2_BANDS", 4)
    out = block.apply(variables, x, train=False)
    assert calls == [4], "banded fused kernel did not engage"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("down,bands", [(False, 1), (True, 1), (False, 2)])
def test_fused_bottleneck_int8_matches_xla_quant(down, bands):
    """fused_bottleneck_int8_infer == the XLA int8 static path
    (Bottleneck quant_eval + quant_static with a calibrated
    "quant_stats" collection), interpret mode. The int8 grids are
    identical by construction (same fold, same per-channel weight
    quantization, same static activation scales), so the fp32 outputs
    agree to accumulation-order noise."""
    from dir_tpu.ops.pallas_bottleneck import fused_bottleneck_int8_infer
    from dir_tpu.ops.quant import scale_from_amax

    rng = np.random.RandomState(11)
    c, mid = 32, 8
    block = Bottleneck(mid, stride=1, downsample=down, expansion=c // mid,
                       quant_eval=True, quant_static=True)
    x = jnp.asarray(rng.randn(2, 8, 8, c).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = _rand_variables(rng, variables)

    # calibration pass fills the quant_stats amaxes on this input
    _, updates = block.apply(variables, x, train=False,
                             mutable=["quant_stats"])
    variables = {**variables, "quant_stats": updates["quant_stats"]}
    ref = block.apply(variables, x, train=False)

    (w1, b1), (w2, b2), (w3, b3) = _fold_from_variables(variables)
    w1 = w1[0, 0]
    w3 = w3[0, 0]
    if down:
        wd, bd = fold_bn(variables["params"]["down_conv"]["kernel"],
                         variables["params"]["down_bn"]["scale"],
                         variables["params"]["down_bn"]["bias"],
                         variables["batch_stats"]["down_bn"]["mean"],
                         variables["batch_stats"]["down_bn"]["var"])
        wd = wd[0, 0]
    else:
        wd = bd = None
    qs = variables["quant_stats"]
    out = fused_bottleneck_int8_infer(
        x, w1, b1, w2, b2, w3, b3,
        scale_from_amax(qs["conv1_in"]),
        scale_from_amax(qs["conv2_in"]),
        scale_from_amax(qs["conv3_in"]),
        wd, bd, interpret=True, bands=bands)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_backbone_quant_fused_guard(monkeypatch):
    """With QUANT_FUSED set, the static-int8 Bottleneck engages the
    fused int8 Pallas kernel at the layer1 shape (spatial 4096, >=128
    ch) and matches the XLA int8 path; calibration and dynamic mode
    stay XLA; default stays XLA."""
    from dir_tpu.models import resnet as rn
    from dir_tpu.ops import pallas_bottleneck as pb

    calls = []
    real = pb.fused_bottleneck_int8_infer
    monkeypatch.setattr(
        pb, "fused_bottleneck_int8_infer",
        lambda *a, **k: calls.append(k.get("bands")) or real(*a, **k))

    rng = np.random.RandomState(13)
    c, mid = 128, 32
    block = rn.Bottleneck(mid, stride=1, downsample=False,
                          expansion=c // mid, quant_eval=True,
                          quant_static=True)
    x = jnp.asarray(rng.randn(1, 64, 64, c).astype(np.float32))
    variables = block.init(jax.random.PRNGKey(0), x)
    variables = _rand_variables(rng, variables)

    monkeypatch.setattr(rn, "_QUANT_FUSED", 1)
    # calibration must stay on the XLA path (it records the amaxes)
    _, upd = block.apply(variables, x, train=False,
                         mutable=["quant_stats"])
    assert calls == [], "fused int8 kernel must not run while calibrating"
    variables = {**variables, "quant_stats": upd["quant_stats"]}

    monkeypatch.setattr(rn, "_QUANT_FUSED", 0)
    ref = block.apply(variables, x, train=False)
    assert calls == [], "QUANT_FUSED=0 must stay XLA"

    monkeypatch.setattr(rn, "_QUANT_FUSED", 1)
    out = block.apply(variables, x, train=False)
    assert calls == [1], "fused int8 kernel did not engage"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
