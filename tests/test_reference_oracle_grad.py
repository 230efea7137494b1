"""Gradient- and trajectory-level parity against the ACTUAL reference.

VERDICT r4 items 1-2: every prior oracle executed only the reference's
*forward* (values and loss terms). These tests execute the reference's
``sum(loss).backward()`` (train.py:69) and its AdamW+scheduler update
(train.py:227-230,84) side by side with ``jax.grad`` / ``optax.adamw``:

  * test_ref_gradient_parity — every parameter group's d(total loss)/dp
    compared tensor-by-tensor. This is the only check that can catch a
    silent stop-gradient mismatch (detach sites models/dir.py:344-347,
    446-453 and the grid-sample coords at dir.py:198), a BN-backward
    difference, or an F.normalize/sqrt-eps VJP divergence — all of
    which previous oracles verified only by reading.
  * test_ref_training_trajectory — N optimizer steps from identical
    converted init on identical batches: per-step losses, parameter
    deltas, and BN running stats must track. Pins weight-decay coupling
    (torch decoupled p*(1-lr*wd) == optax.adamw's -lr*(adam+wd*p)),
    eps placement, bias correction, and BN momentum by execution.
  * test_ref_lr_schedules — torch CosineAnnealingLR / MultiStepLR
    stepped per epoch vs train.state.lr_schedule, every epoch value.

Gradient mapping: the checkpoint table's kinds are all pure layout
permutations (checkpoint.py _FWD: transpose/reshape/slice), and
gradients transform identically to the parameters they belong to — so
torch grads are mapped into flax layout through the very same
``convert_torch_dir_state`` table the weights use.
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from dir_tpu.train import checkpoint as ck

sys.path.insert(0, os.path.dirname(__file__))
import reference_oracle as oracle  # noqa: E402
from test_reference_oracle import _randomize_bn_stats, _sd  # noqa: E402

oracle.install()


def _make_batch(rng, b=2):
    """Synthetic training batch (same construction as
    test_ref_training_loss_assembly)."""
    return {
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


def _to_ref_batch(batch):
    """Our NHWC dict -> the reference's (input, target, meta_info)
    triplet with its layouts (dir.py:513,543-566)."""
    t = {k: torch.from_numpy(v) for k, v in batch.items()}
    ref_input = {"img": t["img"].permute(0, 3, 1, 2).contiguous()}
    ref_target = {
        **{k: t[k] for k in (
            "joint_2d_left", "joint_2d_right", "mesh_2d_left",
            "mesh_2d_right", "joint_3d_left", "joint_3d_right",
            "mesh_3d_left", "mesh_3d_right")},
        "seg": t["seg"].float().unsqueeze(1),
        "dense": t["dense"].permute(0, 3, 1, 2).contiguous(),
    }
    ref_meta = {"center_left": t["center_left"],
                "center_right": t["center_right"]}
    return ref_input, ref_target, ref_meta


def _build_pair(rng, randomize_bn: bool = False):
    """Reference DIR (train mode, synthetic MANO) and our DIR with
    converted weights; returns everything both tests need.

    randomize_bn=False by default: the forward-parity oracles randomize
    BN affine params to exercise the converter, but that inflates
    activations to ~1e4 means, where fp32 BN-backward chains become
    ill-conditioned (measured: torch's own fp32 seg-gradient drifts
    from its fp64 by percent-level there). Gradient parity is asserted
    TIGHTLY on the well-conditioned default-init fixture instead — the
    same detach sites, BN-backward structure, and VJPs are exercised
    either way."""
    oracle.patch_manopth_synthetic()
    from models.dir import DIR as RefDIR

    torch.manual_seed(25)
    tmod = RefDIR(21, "/nonexistent/mano", root_joint=0)
    if randomize_bn:
        _randomize_bn_stats(tmod, rng)
    tmod.train()

    params, stats = ck.convert_torch_dir_state(_sd(tmod))

    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
    from dir_tpu.models.dir import DIR

    cfg = ModelConfig()
    mano_r = synthetic_mano("right", seed=0)
    mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    model = DIR(cfg)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 256, 256, 3), jnp.float32),
                           mano_l, mano_r))
    params = ck.prune_to_target(params, shapes["params"])
    stats = ck.prune_to_target(stats, shapes["batch_stats"])
    return tmod, model, params, stats, shapes, cfg, mano_l, mano_r


def _torch_grads_as_flax(tmod, shapes):
    """Collect p.grad per named parameter and map it into flax layout
    through the same table as the weights. Never-executed params (the
    reference's STE block 0, mixSTE.py:197-199) have grad None -> zeros;
    they are pruned away because our model does not build them."""
    full = dict(_sd(tmod))
    for name, p in tmod.named_parameters():
        g = p.grad
        full[name] = (np.zeros(p.shape, np.float32) if g is None
                      else g.detach().numpy())
    g_params, _ = ck.convert_torch_dir_state(full)
    return ck.prune_to_target(g_params, shapes["params"])


def _flat(tree):
    return {"/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


# ---------------------------------------------------------------------------
# fp64 machinery.
#
# WHY fp64: gradients through a 50-BN trunk are genuinely ill-conditioned
# in fp32 — measured on the randomized-BN fixture's seg term (grad wrt
# backbone conv1): torch-fp32 deviates from torch-fp64 by cos 0.9898 /
# 3% norm, jax-fp32 from the SAME fp64 truth by cos 0.9925, while
# torch-fp64 vs jax-fp64 agree at cos 1.000000 (norms 191.8426 vs
# 191.8417). An fp32-only comparison would need tolerance bands wide
# enough (cos ~0.97) to hide a real structural bug; the fp64 comparison
# asserts at 1e-6 and DID catch one: flax's use_fast_variance default
# (E[x^2]-E[x]^2) skewing every BN backward (now off model-wide).
# ---------------------------------------------------------------------------

@pytest.fixture
def fp64(monkeypatch):
    """Enable jax x64 and make the reference's lovasz backward runnable
    in double: lovasz_grad hard-casts to fp32 INTERNALLY
    (lovasz_loss.py:26-27 ``.float().cumsum``), which both crashes the
    double forward (dot of Double x Float, lovasz_loss.py:200) and
    would inject fp32 rounding into the sorted-Jaccard weights. The
    stand-in is the same Alg.1 math with the two casts widened —
    gt_sorted is exact 0/1, so only precision changes. Restored on
    teardown."""
    jax.config.update("jax_enable_x64", True)
    import models.lovasz_loss as ll

    def lovasz_grad64(gt_sorted):
        p = len(gt_sorted)
        gt = gt_sorted.double()
        gts = gt.sum()
        intersection = gts - gt.cumsum(0)
        union = gts + (1 - gt).cumsum(0)
        jaccard = 1. - intersection / union
        if p > 1:
            jaccard[1:p] = jaccard[1:p] - jaccard[0:-1]
        return jaccard

    monkeypatch.setattr(ll, "lovasz_grad", lovasz_grad64)
    yield
    jax.config.update("jax_enable_x64", False)


def _torch_to_double(tmod):
    tmod.double()
    for m in tmod.modules():
        # plain-attribute adjacency tensors .double() does not reach
        # (SemGCN/p_graph_conv.py:22,27)
        for attr in ("adj_0", "adj_1"):
            t = getattr(m, attr, None)
            if isinstance(t, torch.Tensor) and t.is_floating_point():
                setattr(m, attr, t.double())


def _f64(tree):
    return jax.tree.map(
        lambda x: (jnp.asarray(x, jnp.float64)
                   if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                   else jnp.asarray(x)), tree)


def _build_pair64(rng):
    """fp64 variants of both sides: torch model .double()'d, our DIR
    with dtype='float64' and fp64 params/stats/MANO constants."""
    import dataclasses

    from dir_tpu.models.dir import DIR

    tmod, model, params, stats, shapes, cfg, mano_l, mano_r = \
        _build_pair(rng)
    _torch_to_double(tmod)
    cfg64 = dataclasses.replace(cfg, dtype="float64")
    return (tmod, DIR(cfg64), _f64(params), _f64(stats), shapes, cfg64,
            _f64(mano_l), _f64(mano_r))


def _to_ref_batch64(batch):
    ref_input, ref_target, ref_meta = _to_ref_batch(batch)
    ref_input = {k: v.double() for k, v in ref_input.items()}
    ref_target = {k: v.double() if v.is_floating_point() else v
                  for k, v in ref_target.items()}
    ref_meta = {k: v.double() for k, v in ref_meta.items()}
    return ref_input, ref_target, ref_meta


def _jb64(batch):
    return {k: (jnp.asarray(v, jnp.float64)
                if v.dtype == np.float32 else jnp.asarray(v))
            for k, v in batch.items()}


@pytest.mark.slow
def test_ref_gradient_parity(rng, fp64):
    """d(sum(loss))/dp of the reference's real training-mode backward
    (train.py:69) == jax.grad of our total loss, for every converted
    parameter tensor, at fp64 to 1e-6 — the only check that can catch a
    silent stop-gradient mismatch (detach sites dir.py:344-347,446-453,
    198), a BN-backward difference, or an eps-VJP divergence."""
    tmod, model, params, stats, shapes, cfg, mano_l, mano_r = \
        _build_pair64(rng)
    batch = _make_batch(rng)

    # --- reference: training-mode forward + backward -------------------
    ref_input, ref_target, ref_meta = _to_ref_batch64(batch)
    tmod.zero_grad()
    _, ref_loss = tmod(ref_input, ref_target, ref_meta)
    total_ref = sum(ref_loss[k] for k in ref_loss)  # train.py:69
    total_ref.backward()
    want = _flat(_torch_grads_as_flax(tmod, shapes))

    # --- ours: jax.grad of the identical total ------------------------
    from dir_tpu.models.losses import dir_losses

    jb = _jb64(batch)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats}, jb["img"], mano_l,
            mano_r, train=True, mutable=["batch_stats"])
        per_stage = dir_losses(out, jb, cfg, mano_l.faces, mano_r.faces)
        return sum(jax.tree.leaves(per_stage))

    total_jax, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    got = _flat(jax.device_get(grads))

    # totals agree first (sanity: same loss surface is being derived;
    # measured 8e-9 rel — fp64 reassociation across ~42 terms)
    np.testing.assert_allclose(float(total_jax), float(total_ref),
                               rtol=1e-7)

    assert set(got) == set(want)
    bad = []
    for key in sorted(got):
        g, w = got[key], want[key]
        if np.abs(g).max() < 1e-12 and np.abs(w).max() < 1e-12:
            # both sides agree the gradient is zero (e.g. biases of
            # convs feeding a train-mode BN: the mean subtraction makes
            # d loss/d bias exactly 0; what remains is fp noise ~1e-18)
            continue
        scale = np.abs(w).max() + 1e-30
        err = np.abs(g - w).max() / scale  # full tensors, per-tensor scale
        denom = np.linalg.norm(g) * np.linalg.norm(w)
        cos = float((g * w).sum() / denom) if denom > 0 else 1.0
        if err > 1e-6 or cos < 1 - 1e-9:
            bad.append((key, err, cos,
                        float(np.linalg.norm(g)), float(np.linalg.norm(w))))
    assert not bad, (
        f"{len(bad)}/{len(got)} gradient tensors mismatch "
        f"(key, max|d|/scale, cosine, |got|, |want|): {bad[:15]}")


@pytest.mark.slow
def test_ref_training_trajectory(rng, fp64):
    """N AdamW steps from identical converted init on identical batches:
    the reference's optimizer.step() trajectory (train.py:66-70, AdamW
    lr 5e-4 train.py:227) == our jitted production train step, at fp64.
    Compares per-step total losses, per-tensor parameter deltas after N
    steps, and BN running statistics — pinning by execution: decoupled
    weight decay (torch p*(1-lr*wd) == optax.adamw), eps placement,
    bias correction, and BN momentum 0.1 semantics."""
    tmod, model, params, stats, shapes, cfg, mano_l, mano_r = \
        _build_pair64(rng)

    # 2 steps: enough to pin every optimizer semantic by execution
    # (bias correction changes t=1 -> t=2, weight decay compounds, BN
    # running stats chain). Longer horizons are NOT assertable tightly:
    # the model has hard branches (bone-splat mask `dist < distance`,
    # Lovász sort order), and once an O(1e-8) parameter difference
    # flips one, Adam's normalized update moves every parameter by up
    # to lr in a different direction (measured: step 3's loss moves
    # 1.6e-4 rel, final params by ~lr — pure chaos, not semantics).
    n_steps = 2
    batches = [_make_batch(rng) for _ in range(n_steps)]

    # --- reference trajectory ------------------------------------------
    opt = torch.optim.AdamW(
        [{"params": tmod.parameters(), "initial_lr": 5e-4}], 5e-4)
    ref_losses = []
    for batch in batches:
        ref_input, ref_target, ref_meta = _to_ref_batch64(batch)
        opt.zero_grad()
        _, loss = tmod(ref_input, ref_target, ref_meta)
        total = sum(loss[k] for k in loss)
        total.backward()
        opt.step()
        ref_losses.append(float(total))
    ref_params, _ = ck.convert_torch_dir_state(_sd(tmod))
    want_final = _flat(ck.prune_to_target(ref_params, shapes["params"]))

    # --- our trajectory: the real production train step ----------------
    from dir_tpu.config import TrainConfig
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step

    tcfg = TrainConfig()
    # schedule epoch 0 => lr = cfg.lr exactly, like torch before any
    # schedule.step() (stepped per epoch, train.py:84)
    tx = make_optimizer(tcfg, steps_per_epoch=10**6)
    state = create_train_state({"params": params, "batch_stats": stats},
                               tx)
    step = make_train_step(model, tx, cfg, mano_l, mano_r, donate=False)

    from dir_tpu.models.losses import total_loss
    got_losses = []
    for batch in batches:
        state, loss_dict = step(state, _jb64(batch))
        got_losses.append(float(total_loss(loss_dict)))

    np.testing.assert_allclose(got_losses, ref_losses, rtol=1e-6,
                               err_msg="per-step total loss trajectory")

    # --- final params after N steps -------------------------------------
    # Adam's update is -lr * g/(sqrt(g^2)+eps)-shaped at t=1: an element
    # whose TRUE gradient is below the cross-framework fp64 noise
    # (~1e-6 * per-tensor max, gradient oracle above) can flip its
    # update SIGN, moving that one element by up to ~2*lr on either
    # side (measured: a handful of elements at ~0.5*lr after 2 steps).
    # A real semantics bug (wrong wd coupling / eps / bias correction)
    # shifts EVERY element: caught by per-tensor delta norm + cosine,
    # and by the step-2 loss above riding step-1's full update at 1e-6.
    # The invariant is LOCALITY: flips are isolated elements bounded by
    # ~2*lr, while a systematic update-rule difference moves every
    # element. So: (a) every |dg-dw| <= 2.2*lr; (b) at most a few flip
    # candidates per tensor and model-wide; (c) with flip candidates
    # masked out, the remaining deltas are TIGHT (cos, norm, element).
    lr = tcfg.lr
    init_flat = _flat(jax.device_get(params))
    got_final = _flat(jax.device_get(state.params))
    assert set(got_final) == set(want_final)
    bad, flips_total, elems_total = [], 0, 0
    for key in sorted(got_final):
        dg = got_final[key] - init_flat[key]
        dw = want_final[key] - init_flat[key]
        d = np.abs(dg - dw)
        # true sign flips land at ~lr-scale (measured up to 1.4*lr);
        # diffs of ~0.2*lr are eps-suppression differences on
        # near-zero-grad elements, left to the masked cosine/norm gates
        flip = d > 0.3 * lr
        nflip = int(flip.sum())
        flips_total += nflip
        elems_total += d.size
        m = ~flip
        norm_g = np.linalg.norm(dg[m])
        norm_w = np.linalg.norm(dw[m])
        if norm_g < 1e-12 and norm_w < 1e-12:
            continue
        rel = abs(norm_g - norm_w) / (norm_w + 1e-30)
        denom = norm_g * norm_w
        cos = (float((dg[m] * dw[m]).sum() / denom) if denom > 0 else 1.0)
        # rarity cap: flips are elements whose true gradient is below
        # the cross-framework fp64 noise (measured ~1e-4 of elements in
        # the big conv tensors); a systematic bug flips none of these
        # gates in isolation but trips cosine/norm/elementwise at once
        # masked-cosine gate 5e-5: worst clean-run tensors are small
        # BN vectors where a couple of 0.2*lr suppression-difference
        # elements cost 1.5e-5 of cosine (3x margin kept)
        if (d.max() > 2.2 * lr or nflip > 3 + d.size // 5000
                or rel > 1e-3 or cos < 1 - 5e-5):
            bad.append((key, float(d.max()), nflip, float(rel), cos))
    assert not bad, (
        f"{len(bad)}/{len(got_final)} parameter-delta tensors diverged "
        f"(key, max|d|, flips, |Δnorm|rel, masked cosine): {bad[:15]}")
    assert flips_total <= max(50, elems_total // 2000), (
        f"{flips_total}/{elems_total} flip-scale element diffs "
        f"model-wide — too many for isolated tiny-gradient sign flips")

    # --- BN running stats after N train-mode forwards -------------------
    _, want_stats = ck.convert_torch_dir_state(_sd(tmod))
    want_stats = _flat(ck.prune_to_target(want_stats,
                                          shapes["batch_stats"]))
    got_stats = _flat(jax.device_get(state.batch_stats))
    assert set(got_stats) == set(want_stats)
    for key in sorted(got_stats):
        w = want_stats[key]
        scale = np.abs(w).max() + 1e-30
        # atol 1e-5: step-2 batch stats ride post-step-1 params, which
        # carry the tiny-grad flip elements above — worst clean-run
        # deviation is one element at 2.6e-6 normalized (4x margin)
        np.testing.assert_allclose(
            got_stats[key] / scale, w / scale, atol=1e-5,
            err_msg=f"BN running stat {key}")


def test_ref_adamw_update_rule(fp64):
    """torch.optim.AdamW (the reference's optimizer, train.py:227) ==
    optax.adamw elementwise at fp64, driven by an EXPLICIT gradient
    sequence — pins decoupled weight decay (p*(1-lr*wd) vs optax's
    -lr*(adam+wd*p): algebraically identical), eps placement
    (inside-the-denominator, after bias-corrected sqrt), and bias
    correction, free of any model chaos."""
    import optax

    rng = np.random.RandomState(3)
    n, steps, lr = 257, 10, 5e-4
    w0 = rng.randn(n)
    grad_seq = [rng.randn(n) * 10.0 ** rng.uniform(-6, 2, n)
                for _ in range(steps)]  # 8 decades of gradient scales

    # torch
    p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.AdamW([{"params": [p], "initial_lr": lr}], lr)
    for g in grad_seq:
        opt.zero_grad()
        p.grad = torch.from_numpy(g.copy())
        opt.step()
    want = p.detach().numpy()

    # optax, same defaults as dir_tpu.train.state.make_optimizer
    from dir_tpu.config import TrainConfig
    tx = optax.adamw(lr, weight_decay=TrainConfig().weight_decay)
    wp = jnp.asarray(w0)
    st = tx.init(wp)
    for g in grad_seq:
        upd, st = tx.update(jnp.asarray(g), st, wp)
        wp = optax.apply_updates(wp, upd)

    np.testing.assert_allclose(np.asarray(wp), want, rtol=0, atol=1e-13)


def test_ref_lr_schedules():
    """torch CosineAnnealingLR(T_max=50, eta_min=0) and MultiStepLR([30],
    0.1) stepped per EPOCH (train.py:84,227-232) == lr_schedule at
    step = epoch * steps_per_epoch, for every epoch."""
    from dir_tpu.config import TrainConfig
    from dir_tpu.train.state import lr_schedule

    spe = 7  # arbitrary; schedule must be constant within an epoch
    for kind in ("cosine", "step"):
        cfg = TrainConfig(lr_scheduler=kind)
        sched = lr_schedule(cfg, steps_per_epoch=spe)
        dummy = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.AdamW([{"params": [dummy],
                                  "initial_lr": cfg.lr}], cfg.lr)
        if kind == "cosine":
            tsched = torch.optim.lr_scheduler.CosineAnnealingLR(
                opt, T_max=cfg.total_epochs, eta_min=0)
        else:
            tsched = torch.optim.lr_scheduler.MultiStepLR(
                opt, list(cfg.step_milestones), gamma=cfg.step_gamma,
                last_epoch=-1)
        for epoch in range(cfg.total_epochs):
            want = opt.param_groups[0]["lr"]
            for sub in (0, spe // 2, spe - 1):  # constant within epoch
                got = float(sched(epoch * spe + sub))
                # fp32 cos(x) near pi loses relative precision as the
                # cosine lr -> 0 (observed 2e-6 rel at epoch 46); the
                # absolute error stays ~1e-11 on a 5e-4 lr
                np.testing.assert_allclose(
                    got, want, rtol=1e-4, atol=1e-10,
                    err_msg=f"{kind} epoch {epoch} substep {sub}")
            tsched.step()


def test_bn_fp32_moment_stability(fp64):
    """The |mean| >> std regime that exposed flax's fast-variance bug:
    the shifted single-pass moments (layers._batch_moments, the
    BN_SHIFTED default — one fused HBM pass like the fast path) must
    stay fp32-accurate with a shift that LAGS the true mean (a running
    mean mid-training). The residual fp32 error amplifies as
    eps32 * (mu-shift)^2/var, so the bounds are derived from the lag:
    at mean/std=1000 a 0.5% lag amplifies ~25x (assert rtol 1e-3), a 5%
    lag ~2500x (assert rtol 2e-2, gradient scale error <1%) — vs the
    UNSHIFTED fast form whose amplification is mu^2/var = 1e6 (>10%
    variance error, the cos 0.88 / 1.6x-norm gradient corruption the
    oracle caught)."""
    from dir_tpu.models.layers import _batch_moments

    rng = np.random.RandomState(7)
    c = 8
    mean = rng.uniform(100, 500, (c,))
    x32 = jnp.asarray(
        (mean + 0.3 * rng.randn(64, 14, 14, c)).astype(np.float32))
    xf64 = x32.astype(jnp.float64)
    var64 = jnp.square(xf64 - xf64.mean(axis=(0, 1, 2))).mean(axis=(0, 1, 2))

    # random probe weights: an UNweighted sum of BN outputs is
    # identically zero (each channel sums to zero), so its gradient is
    # degenerate — w makes the 1/sigma and centered-x backward paths
    # actually contribute
    w = jnp.asarray(rng.randn(*x32.shape).astype(np.float32))

    def ref64(x):
        xf = x.astype(jnp.float64)
        mu = xf.mean(axis=(0, 1, 2))
        var = jnp.square(xf - mu).mean(axis=(0, 1, 2))
        return jnp.sum(w.astype(jnp.float64) * (xf - mu)
                       * jax.lax.rsqrt(var + 1e-5))

    g64 = np.asarray(jax.grad(ref64)(x32)).ravel()

    for lag, var_rtol, norm_tol in ((0.005, 1e-3, 1e-3),
                                    (0.05, 2e-2, 1e-2)):
        shift32 = jnp.asarray(
            (mean * (1 + lag * rng.randn(c))).astype(np.float32))
        _, var32 = _batch_moments(x32, (0, 1, 2), shift32)
        np.testing.assert_allclose(np.asarray(var32), np.asarray(var64),
                                   rtol=var_rtol,
                                   err_msg=f"lag {lag}")

        def bnish(x):
            mu, var = _batch_moments(x, (0, 1, 2), shift32)
            return jnp.sum(w * (x - mu) * jax.lax.rsqrt(var + 1e-5))

        g32 = np.asarray(jax.grad(bnish)(x32)).ravel()
        cos = g32 @ g64 / (np.linalg.norm(g32) * np.linalg.norm(g64))
        assert cos > 1 - 1e-5, (lag, cos)
        assert abs(np.linalg.norm(g32) / np.linalg.norm(g64) - 1) \
            < norm_tol, (lag, np.linalg.norm(g32) / np.linalg.norm(g64))

    # the unshifted fast form IS catastrophic on this fixture
    xf32 = x32.astype(jnp.float32)
    var_fast = (jnp.square(xf32).mean(axis=(0, 1, 2))
                - jnp.square(xf32.mean(axis=(0, 1, 2))))
    rel = np.max(np.abs(np.asarray(var_fast) - np.asarray(var64))
                 / np.asarray(var64))
    assert rel > 0.1, f"fixture no longer bites: {rel}"
