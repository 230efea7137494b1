"""Int8 PTQ inference path (dir_tpu/ops/quant.py + Bottleneck.quant_eval).

Oracle strategy: (a) float64-numpy oracle for the quantizers, (b) a
grid-exactness test — when weights and activations already sit on the
int8 grid the quantized conv must equal the fp conv EXACTLY (the s32
accumulator is exact), so any discrepancy is a wiring bug, not
"quantization noise"; (c) end-to-end PTQ error bound on a random
Bottleneck, plus a call-counter assertion that the int8 path actually
executes (the ADVICE-r2 lesson from the fused-bottleneck test).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_weight_quant_oracle():
    from dir_tpu.ops.quant import quantize_weight_per_channel

    rng = np.random.RandomState(0)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    q, s = quantize_weight_per_channel(jnp.asarray(w))
    q, s = np.asarray(q), np.asarray(s)

    # float64 oracle
    amax = np.abs(w.astype(np.float64)).max(axis=(0, 1, 2))
    s64 = amax / 127.0
    np.testing.assert_allclose(s, s64, rtol=1e-6)
    q64 = np.clip(np.round(w.astype(np.float64) / s64), -127, 127)
    assert q.dtype == np.int8
    # fp32-vs-fp64 division can flip exact-.5 rounding; allow <=1 lsb on
    # a vanishing fraction
    assert (q != q64).mean() < 1e-3
    np.testing.assert_allclose(q.astype(np.float64) * s64, w, atol=s64.max())
    # zero channel -> scale 1, all-zero weights
    qz, sz = quantize_weight_per_channel(jnp.zeros((1, 1, 4, 2)))
    assert float(jnp.abs(qz).max()) == 0 and np.all(np.asarray(sz) == 1.0)


def test_act_quant_oracle():
    from dir_tpu.ops.quant import quantize_act_dynamic

    rng = np.random.RandomState(1)
    x = rng.randn(2, 4, 4, 8).astype(np.float32) * 3
    q, s = quantize_act_dynamic(jnp.asarray(x))
    assert q.dtype == jnp.int8
    s64 = np.abs(x.astype(np.float64)).max() / 127.0
    np.testing.assert_allclose(float(s), s64, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(q, np.float64) * s64, x,
                               atol=s64 / 2 + 1e-9)


def test_quant_conv_grid_exact():
    """Inputs already on the int8 grid -> the quantized conv is EXACT."""
    from dir_tpu.ops.quant import quant_conv

    rng = np.random.RandomState(2)
    sx, sw = 0.5, 0.25  # power-of-two scales: x/s is exact in fp32
    xi = rng.randint(-127, 128, (2, 8, 8, 16)).astype(np.float32)
    xi.flat[0] = 127.0  # pin the dynamic scale
    wi = rng.randint(-127, 128, (3, 3, 16, 8)).astype(np.float32)
    wi[0, 0, 0, :] = 127.0  # pin every per-channel scale
    x = jnp.asarray(xi * sx)
    w = jnp.asarray(wi * sw)
    bias = jnp.asarray(rng.randn(8).astype(np.float32))

    got = quant_conv(x, w, (1, 1), ((1, 1), (1, 1)), bias,
                     out_dtype=jnp.float32)

    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn) + bias
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_quant_conv_stride_matches_fp():
    """Stride-2 + SAME padding wiring: int8 path tracks the fp conv to
    PTQ tolerance on random data."""
    from dir_tpu.ops.quant import quant_conv

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(1, 1, 8, 12).astype(np.float32) * 0.1)
    got = np.asarray(quant_conv(x, w, (2, 2), "SAME"))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (2, 2), "SAME", dimension_numbers=dn))
    assert got.shape == want.shape == (2, 8, 8, 12)
    rms = np.sqrt(((got - want) ** 2).mean()) / np.sqrt((want ** 2).mean())
    assert rms < 0.02, rms


@pytest.mark.parametrize("downsample,stride", [(False, 1), (True, 2)])
def test_bottleneck_quant_path(downsample, stride):
    """The quant_eval Bottleneck (BN folded + int8 convs) tracks the XLA
    fp block within PTQ error, and the int8 path actually runs."""
    import dir_tpu.ops.quant as quant
    from dir_tpu.models.resnet import Bottleneck

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))

    ref = Bottleneck(planes=8, stride=stride, downsample=downsample)
    qb = Bottleneck(planes=8, stride=stride, downsample=downsample,
                    quant_eval=True)
    variables = ref.init(jax.random.PRNGKey(0), x, True)
    # non-trivial BN stats so the fold is exercised
    stats = jax.tree.map(
        lambda v: v + jnp.asarray(
            np.abs(rng.randn(*v.shape)).astype(np.float32) * 0.3),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    want = np.asarray(ref.apply(variables, x, False))

    calls = {"n": 0}
    orig = quant.conv_int8

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    quant.conv_int8 = counting
    try:
        got = np.asarray(qb.apply(variables, x, False))
    finally:
        quant.conv_int8 = orig

    assert calls["n"] == (4 if downsample else 3)
    assert got.shape == want.shape
    denom = np.sqrt((want ** 2).mean()) + 1e-8
    rms = np.sqrt(((got - want) ** 2).mean()) / denom
    assert rms < 0.06, rms


@pytest.mark.parametrize("with_pair,channels", [(False, 64), (False, 32),
                                                (True, 32)])
def test_residual_quant_path(with_pair, channels):
    """Residual.quant_eval (decoder blocks): int8 convs on the existing
    variable tree track the fp block within PTQ error; the int8 path
    actually runs (3 convs + skip when channels mismatch)."""
    import dir_tpu.ops.quant as quant
    from dir_tpu.models.layers import Residual

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(2, 8, 8, channels).astype(np.float32))
    pair = (jnp.asarray(rng.randn(2, 8, 8, 16).astype(np.float32))
            if with_pair else None)

    ref = Residual(64)
    qb = Residual(64, quant_eval=True)
    kw = {"pair": pair} if with_pair else {}
    variables = ref.init(jax.random.PRNGKey(0), x, True, **kw)
    stats = jax.tree.map(
        lambda v: v + jnp.asarray(
            np.abs(rng.randn(*v.shape)).astype(np.float32) * 0.2),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    want = np.asarray(ref.apply(variables, x, False, **kw))

    calls = {"n": 0}
    orig = quant.conv_int8

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    quant.conv_int8 = counting
    try:
        got = np.asarray(qb.apply(variables, x, False, **kw))
    finally:
        quant.conv_int8 = orig

    in_dim = channels + (16 if with_pair else 0)
    assert calls["n"] == (3 if in_dim == 64 else 4)
    assert got.shape == want.shape
    denom = np.sqrt((want ** 2).mean()) + 1e-8
    rms = np.sqrt(((got - want) ** 2).mean()) / denom
    assert rms < 0.06, rms


def test_fused_guard_takes_precedence_over_quant():
    """With BOTH flags set, a block the Pallas guard accepts (stride 1,
    >=128 input channels, spatial >= 4096) runs the fused path, NOT the
    int8 path — the measured-best layer1 treatment wins (resnet.py
    guard ordering). Both paths are stubbed; only dispatch is tested."""
    from dir_tpu.models.resnet import Bottleneck

    x = jnp.zeros((1, 64, 64, 256), jnp.float32)
    blk = Bottleneck(planes=64, fused_eval=True, quant_eval=True)
    variables = blk.init(jax.random.PRNGKey(0), x, True)

    calls = []
    orig_fused = Bottleneck._fused_infer
    orig_quant = Bottleneck._quant_infer
    Bottleneck._fused_infer = lambda self, x, bands=0: (
        calls.append("fused") or x)
    Bottleneck._quant_infer = lambda self, x: calls.append("quant") or x
    try:
        blk.apply(variables, x, False)
        assert calls == ["fused"]
        # a block the Pallas guard rejects (small spatial) falls through
        # to the int8 path
        calls.clear()
        xs = jnp.zeros((1, 16, 16, 256), jnp.float32)
        vs = blk.init(jax.random.PRNGKey(0), xs, True)
        blk.apply(vs, xs, False)
        assert calls == ["quant"]
    finally:
        Bottleneck._fused_infer = orig_fused
        Bottleneck._quant_infer = orig_quant


def test_static_scales_match_dynamic_after_calibration():
    """Calibrate on batch X, then static-serve the SAME batch: stored
    amax == live max, so static and dynamic paths agree exactly."""
    from dir_tpu.models.resnet import Bottleneck
    from dir_tpu.ops.quant import merge_calibration

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    dyn = Bottleneck(planes=8, downsample=True, quant_eval=True)
    sta = Bottleneck(planes=8, downsample=True, quant_eval=True,
                     quant_static=True)
    variables = dyn.init(jax.random.PRNGKey(0), x, True)

    want = np.asarray(dyn.apply(variables, x, False))

    _, ups = sta.apply(variables, x, False, mutable=["quant_stats"])
    qs = ups["quant_stats"]
    assert set(qs) == {"conv1_in", "conv2_in", "conv3_in", "down_in"}
    got = np.asarray(sta.apply(merge_calibration(variables, ups), x,
                               False))
    np.testing.assert_array_equal(got, want)


def test_static_calibration_accumulates_and_saturates():
    """Maxes accumulate monotonically across calibration calls; serving
    inputs beyond the calibrated range saturate (finite, bounded)."""
    from dir_tpu.models.layers import Residual
    from dir_tpu.ops.quant import merge_calibration

    rng = np.random.RandomState(8)
    x_small = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    x_big = x_small * 4.0
    sta = Residual(64, quant_eval=True, quant_static=True)
    variables = sta.init(jax.random.PRNGKey(0), x_small, True)

    _, up1 = sta.apply(variables, x_big, False, mutable=["quant_stats"])
    v2 = merge_calibration(variables, up1)
    _, up2 = sta.apply(v2, x_small, False, mutable=["quant_stats"])
    a1 = np.asarray(up1["quant_stats"]["conv1_in"])
    a2 = np.asarray(up2["quant_stats"]["conv1_in"])
    assert a2 == a1  # the smaller batch cannot lower the stored max

    # calibrated on x_small only, served on 4x bigger: saturates
    _, up_small = sta.apply(variables, x_small, False,
                            mutable=["quant_stats"])
    out = np.asarray(sta.apply(merge_calibration(variables, up_small),
                               x_big, False))
    assert np.isfinite(out).all()


def test_backbone_quant_all_blocks():
    """ResNetPyramid(quant_eval=True): every Bottleneck conv runs int8
    (no fused flag here — guard-ordering is covered above); pyramid
    shapes and finiteness preserved; params identical to the fp model."""
    import dir_tpu.ops.quant as quant
    from dir_tpu.models.resnet import ResNetPyramid

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref = ResNetPyramid(layers=(1, 1, 1, 1))
    qn = ResNetPyramid(layers=(1, 1, 1, 1), quant_eval=True)
    variables = ref.init(jax.random.PRNGKey(0), x, True)

    calls = {"n": 0}
    orig = quant.conv_int8

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    quant.conv_int8 = counting
    try:
        feats = qn.apply(variables, x, False)
    finally:
        quant.conv_int8 = orig

    # 4 blocks x (3 convs + 1 downsample) = 16 int8 convs
    assert calls["n"] == 16
    ref_feats = ref.apply(variables, x, False)
    for f, rf in zip(feats, ref_feats):
        assert f.shape == rf.shape
        assert np.isfinite(np.asarray(f)).all()


def test_attention_pool_quant_path():
    """AttentionPool.quant_eval: conv1 runs int8 with the FOLLOWING BN
    folded in (ops/quant.py:module_quant_conv extends fold_bn to convs
    with their own bias); conv2 stays fp. Tracks the fp module within
    PTQ error."""
    import dir_tpu.ops.quant as quant
    from dir_tpu.models.dir import AttentionPool

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    ref = AttentionPool()
    qm = AttentionPool(quant_eval=True)
    variables = ref.init(jax.random.PRNGKey(0), x, True)
    stats = jax.tree.map(
        lambda v: v + jnp.asarray(
            np.abs(rng.randn(*v.shape)).astype(np.float32) * 0.3),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    want = np.asarray(ref.apply(variables, x, False))

    calls = {"n": 0}
    orig = quant.conv_int8

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    quant.conv_int8 = counting
    try:
        got = np.asarray(qm.apply(variables, x, False))
    finally:
        quant.conv_int8 = orig

    assert calls["n"] == 1  # conv1 only; the 1x1->sigmoid head stays fp
    denom = np.sqrt((want ** 2).mean()) + 1e-8
    rms = np.sqrt(((got - want) ** 2).mean()) / denom
    assert rms < 0.06, rms


def test_seg_dense_head_quant_path():
    """SegDenseHead.quant_eval: int8 conv1 + folded BN; the 3-logit
    conv2 stays fp."""
    import dir_tpu.ops.quant as quant
    from dir_tpu.models.dir import SegDenseHead

    rng = np.random.RandomState(10)
    x = jnp.asarray(rng.randn(2, 8, 8, 32).astype(np.float32))
    ref = SegDenseHead()
    qm = SegDenseHead(quant_eval=True)
    variables = ref.init(jax.random.PRNGKey(0), x, True)
    stats = jax.tree.map(
        lambda v: v + jnp.asarray(
            np.abs(rng.randn(*v.shape)).astype(np.float32) * 0.3),
        variables["batch_stats"])
    variables = {"params": variables["params"], "batch_stats": stats}

    want = np.asarray(ref.apply(variables, x, False))

    calls = {"n": 0}
    orig = quant.conv_int8

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    quant.conv_int8 = counting
    try:
        got = np.asarray(qm.apply(variables, x, False))
    finally:
        quant.conv_int8 = orig

    assert calls["n"] == 1
    denom = np.sqrt((want ** 2).mean()) + 1e-8
    rms = np.sqrt(((got - want) ** 2).mean()) / denom
    assert rms < 0.06, rms


@pytest.mark.parametrize("stem", ["conv7", "s2d"])
def test_stem_quant_path(stem):
    """ResNetPyramid.quant_stem: the stem conv runs int8 with bn1
    folded (block convs stay fp when quant_eval is off); pyramid
    outputs track the fp model within PTQ error."""
    import dir_tpu.ops.quant as quant
    from dir_tpu.models.resnet import ResNetPyramid

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    ref = ResNetPyramid(layers=(1, 1, 1, 1), stem=stem)
    qn = ResNetPyramid(layers=(1, 1, 1, 1), stem=stem, quant_stem=True)
    variables = ref.init(jax.random.PRNGKey(0), x, True)

    calls = {"n": 0}
    orig = quant.conv_int8

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    quant.conv_int8 = counting
    try:
        feats = qn.apply(variables, x, False)
    finally:
        quant.conv_int8 = orig

    assert calls["n"] == 1  # the stem conv only
    ref_feats = ref.apply(variables, x, False)
    for f, rf in zip(feats, ref_feats):
        assert f.shape == rf.shape
        denom = np.sqrt((np.asarray(rf) ** 2).mean()) + 1e-8
        rms = np.sqrt(((np.asarray(f) - np.asarray(rf)) ** 2).mean()) / denom
        assert rms < 0.15, rms


def test_model_quant_aux_engages_and_calibrates():
    """Full tiny DIR with ONLY quant_aux_eval: exactly the 9 aux convs
    run int8 (stem + 2 AttentionPools + 2 fusion_conv2 + final_conv1/2
    + 2 head conv1s), outputs stay close to fp, the parameter tree is
    unchanged, and calibration records one amax per aux conv input."""
    import dir_tpu.ops.quant as quant
    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
    from dir_tpu.models.dir import DIR
    from dir_tpu.ops.quant import merge_calibration

    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    rng = np.random.RandomState(12)
    img = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))

    fp = DIR(ModelConfig(backbone_layers=(1, 1, 1, 1)))
    qm = DIR(ModelConfig(backbone_layers=(1, 1, 1, 1), quant_aux_eval=True))
    variables = fp.init(jax.random.PRNGKey(0), img, mano_l, mano_r)
    assert (jax.tree_util.tree_structure(
        qm.init(jax.random.PRNGKey(0), img, mano_l, mano_r))
        == jax.tree_util.tree_structure(variables))

    out_fp = fp.apply(variables, img, mano_l, mano_r, train=False)

    calls = {"n": 0}
    orig = quant.conv_int8

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    quant.conv_int8 = counting
    try:
        out_q = qm.apply(variables, img, mano_l, mano_r, train=False)
    finally:
        quant.conv_int8 = orig

    assert calls["n"] == 9
    a = np.asarray(out_fp["stages"][-1]["pd_joint_xyz_left"])
    b = np.asarray(out_q["stages"][-1]["pd_joint_xyz_left"])
    assert np.abs(a - b).max() < 0.05, np.abs(a - b).max()

    # calibration fills one amax per aux conv input, then static serves
    sta = DIR(ModelConfig(backbone_layers=(1, 1, 1, 1), quant_aux_eval=True,
                          quant_static=True))
    _, ups = sta.apply(variables, img, mano_l, mano_r, train=False,
                       mutable=["quant_stats"])
    leaves = jax.tree_util.tree_leaves(ups["quant_stats"])
    assert len(leaves) == 9
    got = sta.apply(merge_calibration(variables, ups), img, mano_l, mano_r,
                    train=False)
    np.testing.assert_array_equal(
        np.asarray(got["stages"][-1]["pd_joint_xyz_left"]), b)
