"""End-to-end trainer smoke test: synthetic data -> sharded train steps ->
metric eval -> checkpoint save/restore. Tiny backbone, 2-device mesh."""

import dataclasses
import os

import numpy as np
import jax
import pytest

from dir_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from dir_tpu.data import synthetic
from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
from dir_tpu.parallel.mesh import make_mesh
from dir_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    data_dir = str(tmp_path_factory.mktemp("data"))
    synthetic.generate(data_dir, left, right, split="train", num_samples=4)
    synthetic.generate(data_dir, left, right, split="test", num_samples=3,
                       seed=5)
    out_dir = str(tmp_path_factory.mktemp("out"))
    cfg = Config(
        model=ModelConfig(backbone_layers=(1, 1, 1, 1)),
        data=DataConfig(data_dir=data_dir, num_workers=2),
        train=TrainConfig(batch_size=2, total_epochs=1, print_every=1,
                          output_dir=out_dir),
    )
    return cfg, left, right


@pytest.mark.slow
def test_trainer_end_to_end(env):
    cfg, left, right = env
    trainer = Trainer(cfg, left, right, mesh=make_mesh(2))
    trainer.make_data()
    trainer.make_model()

    best = trainer.train()
    assert np.isfinite(best)
    # checkpoints written
    assert os.path.isdir(os.path.join(cfg.train.output_dir, "checkpoint",
                                      "latest"))
    assert int(trainer.state.step) == 2  # 4 samples / batch 2, 1 epoch

    # restore round-trip
    from dir_tpu.train import checkpoint as ckpt
    restored = ckpt.restore_checkpoint(
        os.path.join(cfg.train.output_dir, "checkpoint"), trainer.state,
        "latest")
    np.testing.assert_allclose(
        np.asarray(restored.params["backbone"]["conv1"]["kernel"]),
        np.asarray(trainer.state.params["backbone"]["conv1"]["kernel"]))


@pytest.mark.slow
def test_eval_metrics_reasonable(env):
    cfg, left, right = env
    trainer = Trainer(cfg, left, right, mesh=make_mesh(2))
    trainer.make_data()
    trainer.make_model()
    summary = trainer.evaluate()
    for key in ("joint_mean_all_mm", "vert_mean_all_mm", "root_mean_mm",
                "joint2d_mean_all_px"):
        assert np.isfinite(summary[key]), key
        assert summary[key] >= 0

    # the reference Trainer's in-loop metric (inloop_metric="online",
    # dataset/interhand.py:262-315): joint/vert means only
    trainer.cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, inloop_metric="online"))
    online = trainer.evaluate()
    assert set(online) == {
        "joint_mean_left_mm", "joint_mean_right_mm", "joint_mean_all_mm",
        "vert_mean_left_mm", "vert_mean_right_mm", "vert_mean_all_mm"}
    for v in online.values():
        assert np.isfinite(v) and v >= 0


@pytest.mark.slow
def test_trainer_device_pipeline(env):
    """Trainer with the fused on-device preprocessing path."""
    import dataclasses
    cfg, left, right = env
    cfg2 = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, device_pipeline=True),
        train=dataclasses.replace(
            cfg.train, draw_every=0,
            output_dir=cfg.train.output_dir + "_dev"))
    trainer = Trainer(cfg2, left, right, mesh=make_mesh(2))
    trainer.make_data()
    trainer.make_model()
    best = trainer.train()
    assert np.isfinite(best)
    assert int(trainer.state.step) == 2


@pytest.mark.slow
def test_trainer_packed_cache(env):
    """Trainer through the packed decode-once sample cache
    (data.packed_cache=True; VERDICT r4 #3): one epoch runs end-to-end
    and the first logged loss equals the JPEG-path trainer's bitwise —
    the cache is output-identical, so step 1 on identical shuffled
    batches must produce the identical loss."""
    import dataclasses

    from dir_tpu.data.sample_cache import build_cache

    cfg, left, right = env
    build_cache(cfg.data.data_dir, "train", left, right, log_every=0)
    build_cache(cfg.data.data_dir, "test", left, right, log_every=0)

    def first_loss(packed: bool, tag: str) -> float:
        cfg2 = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, packed_cache=packed),
            train=dataclasses.replace(
                cfg.train, draw_every=0, total_epochs=1,
                output_dir=cfg.train.output_dir + tag))
        trainer = Trainer(cfg2, left, right, mesh=make_mesh(2))
        trainer.make_data()
        trainer.make_model()
        best = trainer.train()
        assert np.isfinite(best)
        assert int(trainer.state.step) == 2
        return trainer.last_loss

    got = first_loss(True, "_cache")
    want = first_loss(False, "_jpg")
    assert got == want  # bit-identical batches -> bit-identical loss


@pytest.mark.slow
def test_loss_decreases_overfitting_one_batch(env):
    """30 update steps on a fixed batch must cut the loss substantially —
    catches broken gradients / update wiring that shape tests miss."""
    import jax
    import jax.numpy as jnp
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step
    from dir_tpu.data.interhand import InterHandDataset
    from dir_tpu.data.loader import BatchLoader
    from dir_tpu.models.dir import DIR

    cfg, left, right = env
    ds = InterHandDataset(cfg.data.data_dir, "train", left, right,
                          augment_train=False)
    batch = next(iter(BatchLoader(ds, 2, shuffle=False, num_threads=1)))
    keys = ("img", "joint_2d_left", "joint_2d_right", "mesh_2d_left",
            "mesh_2d_right", "joint_3d_left", "joint_3d_right",
            "mesh_3d_left", "mesh_3d_right", "center_left", "center_right",
            "seg", "dense")
    batch = {k: jnp.asarray(batch[k]) for k in keys}

    model = DIR(cfg.model)
    variables = model.init(jax.random.PRNGKey(0), batch["img"], left, right)
    tx = make_optimizer(cfg.train, steps_per_epoch=10 ** 6)  # constant lr
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg.model, left, right, donate=False)

    state, first = step(state, batch)
    first_total = float(sum(jax.tree.map(float, first).values()))
    for _ in range(30):
        state, loss = step(state, batch)
    last_total = float(sum(jax.tree.map(float, loss).values()))
    assert np.isfinite(last_total)
    assert last_total < 0.8 * first_total, (first_total, last_total)


@pytest.mark.slow
def test_dp_step_equals_single_device(env):
    """DP correctness, not just liveness: one sharded train step on the
    8-device mesh must agree with the identical step on one device
    (XLA's SPMD partitioning computes global-array semantics; the
    gradient all-reduce is exact up to fp32 reduction order).

    Compared quantities: the loss dict and BN stats tightly, the
    GRADIENTS leaf-wise by relative norm (the actual all-reduce
    output), and the post-AdamW params only by the per-element 2*lr
    bound + finiteness — at step 1 Adam's update is ~lr*sign(grad), so
    an ulp-level reduction-order difference on any near-zero gradient
    component legitimately flips a full +-lr and element-wise param
    comparison measures noise, not correctness. (The finiteness check
    matters: it caught NaN gradients that assert_allclose's default
    equal_nan=True silently accepted.)"""
    import jax
    import jax.numpy as jnp
    from dir_tpu.train.state import create_train_state, make_optimizer
    from dir_tpu.train.steps import make_train_step

    cfg, left, right = env
    from dir_tpu.models.dir import DIR

    model = DIR(cfg.model)
    b = 8
    rng = np.random.RandomState(3)
    batch = {
        "img": rng.rand(b, 32, 32, 3).astype(np.float32),
        "joint_2d_left": rng.randn(b, 21, 3).astype(np.float32),
        "joint_2d_right": rng.randn(b, 21, 3).astype(np.float32),
        "mesh_2d_left": rng.randn(b, 778, 3).astype(np.float32),
        "mesh_2d_right": rng.randn(b, 778, 3).astype(np.float32),
        "joint_3d_left": rng.randn(b, 21, 3).astype(np.float32) * 0.1,
        "joint_3d_right": rng.randn(b, 21, 3).astype(np.float32) * 0.1,
        "mesh_3d_left": rng.randn(b, 778, 3).astype(np.float32) * 0.1,
        "mesh_3d_right": rng.randn(b, 778, 3).astype(np.float32) * 0.1,
        "center_left": rng.randn(b, 1, 3).astype(np.float32) * 0.1,
        "center_right": rng.randn(b, 1, 3).astype(np.float32) * 0.1,
        "seg": rng.randint(0, 3, size=(b, 32, 32)).astype(np.int32),
        "dense": rng.rand(b, 32, 32, 3).astype(np.float32),
    }
    img = jnp.asarray(batch["img"])
    variables = model.init(jax.random.PRNGKey(0), img, left, right)
    tx = make_optimizer(cfg.train, steps_per_epoch=10)

    # Single device.
    state1 = create_train_state(variables, tx)
    step1 = make_train_step(model, tx, cfg.model, left, right, donate=False)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    state1, loss1 = step1(state1, jbatch)

    # 8-device data mesh.
    from dir_tpu.parallel.mesh import shard_batch
    mesh = make_mesh(8)
    state8 = create_train_state(variables, tx)
    with mesh:
        sbatch = shard_batch({k: np.asarray(v) for k, v in batch.items()},
                             mesh)
        step8 = make_train_step(model, tx, cfg.model, left, right,
                                mesh=mesh, donate=False)
        state8, loss8 = step8(state8, sbatch)

    for k in loss1:
        np.testing.assert_allclose(float(loss1[k]), float(loss8[k]),
                                   rtol=2e-4, atol=1e-6, err_msg=k)

    # Gradients: the direct output of the sharded all-reduce. Leaf-wise
    # relative L2 error — element-wise comparison is meaningless for
    # near-zero components under fp32 reduction-order noise.
    from dir_tpu.models.losses import dir_losses, total_loss

    def loss_fn(params, bat):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            bat["img"], left, right, train=True, mutable=["batch_stats"])
        ld = dir_losses(out, bat, cfg.model, left.faces, right.faces,
                        fused_stages=True)
        return total_loss(ld)

    grads1 = jax.jit(jax.grad(loss_fn))(variables["params"], jbatch)
    with mesh:
        from dir_tpu.parallel.mesh import batch_sharding, \
            replicated_sharding
        grads8 = jax.jit(
            jax.grad(loss_fn),
            in_shardings=(replicated_sharding(mesh), batch_sharding(mesh)),
            out_shardings=replicated_sharding(mesh),
        )(variables["params"], sbatch)

    gmax = max(float(jnp.max(jnp.abs(g))) for g in jax.tree.leaves(grads1))

    def check_grad(path, a, b_):
        a = np.asarray(a, np.float64)
        b_ = np.asarray(b_, np.float64)
        assert np.all(np.isfinite(a)) and np.all(np.isfinite(b_)), \
            f"non-finite gradient at {jax.tree_util.keystr(path)}"
        # Leaves whose true gradient is ~0 (e.g. a conv bias feeding a
        # BatchNorm: the mean subtraction cancels it exactly) are pure
        # cancellation residue — relative error there is meaningless;
        # bound them absolutely against the global gradient scale.
        if np.abs(a).max() < 1e-5 * gmax:
            assert np.abs(a - b_).max() < 1e-5 * gmax, \
                f"near-zero-grad leaf diverges at {jax.tree_util.keystr(path)}"
            return
        rel = np.linalg.norm(a - b_) / (np.linalg.norm(a) + 1e-12)
        # 5e-3: BN bias/scale grads sum ~mean-zero contributions, so
        # reduction-order noise is amplified by the cancellation factor
        # (measured up to 1.6e-3 on this leaf set). A real DP bug is
        # orders larger — e.g. a missing gradient all-reduce leaves
        # each replica with 1/8 of the sum, rel-err ~0.9.
        assert rel < 5e-3, \
            f"grad rel-err {rel:.2e} at {jax.tree_util.keystr(path)}"

    jax.tree_util.tree_map_with_path(check_grad, grads1, grads8)

    # Post-AdamW params: bounded by the 2*lr step-1 mechanism + finite.
    adam_atol = 2.1 * float(cfg.train.lr)

    def check_param(a, b_):
        diff = np.abs(np.asarray(a, np.float64) - np.asarray(b_, np.float64))
        assert np.all(np.isfinite(diff)), "non-finite params after step"
        assert diff.max() <= adam_atol, \
            f"param diff {diff.max()} exceeds the 2*lr Adam bound"

    jax.tree.map(check_param, state1.params, state8.params)
    # BN stats: global-batch means/vars; atol covers fp32 reduction
    # order on the cross-replica sums (measured diffs up to ~1.2e-5).
    jax.tree.map(
        lambda a, b_: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=5e-5),
        state1.batch_stats, state8.batch_stats)


@pytest.mark.slow
def test_trainer_resume(env):
    """continue_train restores step count and parameters."""
    import dataclasses
    import jax
    import jax.numpy as jnp
    cfg, left, right = env
    out1 = cfg.train.output_dir + "_resume"
    cfg1 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, output_dir=out1,
                                       draw_every=0))
    t1 = Trainer(cfg1, left, right, mesh=make_mesh(2))
    t1.make_data()
    t1.make_model()
    t1.train()
    step1 = int(t1.state.step)
    kernel1 = np.asarray(t1.state.params["backbone"]["conv1"]["kernel"])

    ckpt_dir = os.path.join(out1, "checkpoint")
    cfg2 = dataclasses.replace(
        cfg1, train=dataclasses.replace(cfg1.train, checkpoint=ckpt_dir,
                                        continue_train=True, draw_every=0))
    t2 = Trainer(cfg2, left, right, mesh=make_mesh(2))
    t2.make_data()
    t2.make_model()
    assert int(t2.state.step) == step1
    np.testing.assert_allclose(
        np.asarray(t2.state.params["backbone"]["conv1"]["kernel"]), kernel1)


@pytest.mark.slow
def test_unrolled_steps_match_sequential(env):
    """make_train_step(unroll=2) over stacked batches == two sequential
    unroll=1 dispatches (same params/BN stats/opt state), so the
    steps_per_call dispatch amortization never changes the math."""
    import jax.numpy as jnp

    from dir_tpu.config import ModelConfig
    from dir_tpu.models.dir import DIR
    from dir_tpu.train.state import create_train_state
    from dir_tpu.train.steps import make_train_step

    cfg, left, right = env
    mcfg = ModelConfig(backbone_layers=(1, 1, 1, 1))
    model = DIR(mcfg)
    rng = np.random.RandomState(7)
    b, s = 2, 64

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        return {
            "img": r.randn(b, s, s, 3).astype(np.float32),
            "joint_2d_left": r.randn(b, 21, 3).astype(np.float32),
            "joint_2d_right": r.randn(b, 21, 3).astype(np.float32),
            "mesh_2d_left": r.randn(b, 778, 3).astype(np.float32),
            "mesh_2d_right": r.randn(b, 778, 3).astype(np.float32),
            "joint_3d_left": r.randn(b, 21, 3).astype(np.float32) * 0.1,
            "joint_3d_right": r.randn(b, 21, 3).astype(np.float32) * 0.1,
            "mesh_3d_left": r.randn(b, 778, 3).astype(np.float32) * 0.1,
            "mesh_3d_right": r.randn(b, 778, 3).astype(np.float32) * 0.1,
            "center_left": r.randn(b, 1, 3).astype(np.float32) * 0.1,
            "center_right": r.randn(b, 1, 3).astype(np.float32) * 0.1,
            "seg": r.randint(0, 3, size=(b, s, s)).astype(np.int32),
            "dense": r.rand(b, s, s, 3).astype(np.float32),
        }

    b1, b2 = mk_batch(1), mk_batch(2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(b1["img"][:1]), left, right)
    # SGD, not AdamW: adam's normalized update is +-lr*sign(g) for
    # near-zero gradient dims, so fp32 reassociation between the scan
    # body and the standalone step flips whole update signs — SGD keeps
    # the comparison tight while exercising identical scan mechanics
    # (state threading, per-step batch indexing, BN stats).
    import optax
    tx = optax.sgd(1e-3, momentum=0.9)

    seq_state = create_train_state(variables, tx)
    step1 = make_train_step(model, tx, mcfg, left, right, donate=False)
    seq_state, _ = step1(seq_state, b1)
    seq_state, seq_loss = step1(seq_state, b2)

    un_state = create_train_state(variables, tx)
    step2 = make_train_step(model, tx, mcfg, left, right, donate=False,
                            unroll=2)
    stacked = {k: np.stack([b1[k], b2[k]]) for k in b1}
    un_state, un_loss = step2(un_state, stacked)

    assert int(un_state.step) == int(seq_state.step) == 2
    # Final loss = step-2 loss on batch 2 at params updated by batch 1:
    # a wrong batch order / skipped update would shift it macroscopically
    # (the scan body reassociates fp32, so exact equality is out — the
    # model's gradient crosses discrete boundaries (splat masks, sort
    # ties) and post-update params differ at ~1e-3 of the UPDATE scale).
    np.testing.assert_allclose(
        float(sum(jax.tree.map(float, un_loss).values())),
        float(sum(jax.tree.map(float, seq_loss).values())), rtol=1e-4)

    # Params: per-leaf, the scan-vs-sequential discrepancy must be tiny
    # RELATIVE TO THE APPLIED UPDATE — a mechanics bug (wrong batch,
    # dropped step) shows up at ratio ~1.
    p0 = variables["params"]

    def update_relative(a, c, z):
        diff = np.max(np.abs(np.asarray(a) - np.asarray(c)))
        upd = np.max(np.abs(np.asarray(c) - np.asarray(z)))
        # measured chaos ratio ~0.08 (discrete-boundary gradient flips
        # under reassociation); a wrong/dropped batch reads ~1.0
        assert diff <= 0.25 * upd + 1e-6, (diff, upd)

    jax.tree.map(update_relative, un_state.params, seq_state.params, p0)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-4),
        un_state.batch_stats, seq_state.batch_stats)


@pytest.mark.slow
def test_trainer_resume_trajectory(env):
    """Interrupt-and-resume == uninterrupted run: the epoch-keyed
    shuffle + aug RNG and the meta.json epoch/best/aug-key bookkeeping
    make the continued loss trajectory identical (the reference restores
    last_epoch + optimizer + schedule, train.py:127-135)."""
    cfg, left, right = env

    def make(out_dir, epochs, resume_ckpt=None):
        tr = dataclasses.replace(
            cfg.train, output_dir=out_dir, total_epochs=epochs,
            draw_every=0, eval_every_epochs=0,
            checkpoint=resume_ckpt or "",
            continue_train=resume_ckpt is not None)
        t = Trainer(dataclasses.replace(cfg, train=tr), left, right,
                    mesh=make_mesh(2))
        t.make_data()
        t.make_model()
        t.train()
        return t

    out_a = cfg.train.output_dir + "_traj_a"
    out_b = cfg.train.output_dir + "_traj_b"
    ta = make(out_a, epochs=2)

    tb1 = make(out_b, epochs=1)
    assert ckpt_meta_epoch(out_b) == 1
    tb2 = make(out_b, epochs=2,
               resume_ckpt=os.path.join(out_b, "checkpoint"))
    assert tb2.start_epoch == 1
    assert int(tb2.state.step) == int(ta.state.step)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ta.state.params, tb2.state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ta.state.batch_stats, tb2.state.batch_stats)


def ckpt_meta_epoch(out_dir):
    from dir_tpu.train import checkpoint as ckpt
    return ckpt.load_meta(os.path.join(out_dir, "checkpoint")).get("epoch")


@pytest.mark.slow
def test_grad_accum_matches_manual_accumulation(env):
    """make_train_step(grad_accum=2) == hand-computed accumulation:
    per-micro grads at the SAME initial params (BN stats chained
    micro-to-micro), f32-averaged, ONE optimizer update. Catches the
    classic accumulation bugs (updating params mid-accumulation, wrong
    stat threading, sum instead of mean)."""
    import jax.numpy as jnp
    import optax

    from dir_tpu.config import ModelConfig
    from dir_tpu.models.dir import DIR
    from dir_tpu.models.losses import dir_losses, total_loss
    from dir_tpu.train.state import create_train_state
    from dir_tpu.train.steps import make_train_step

    cfg, left, right = env
    mcfg = ModelConfig(backbone_layers=(1, 1, 1, 1))
    model = DIR(mcfg)
    b, s = 2, 64

    def mk_batch(seed):
        r = np.random.RandomState(seed)
        return {
            "img": r.randn(b, s, s, 3).astype(np.float32),
            "joint_2d_left": r.randn(b, 21, 3).astype(np.float32),
            "joint_2d_right": r.randn(b, 21, 3).astype(np.float32),
            "mesh_2d_left": r.randn(b, 778, 3).astype(np.float32),
            "mesh_2d_right": r.randn(b, 778, 3).astype(np.float32),
            "joint_3d_left": r.randn(b, 21, 3).astype(np.float32) * 0.1,
            "joint_3d_right": r.randn(b, 21, 3).astype(np.float32) * 0.1,
            "mesh_3d_left": r.randn(b, 778, 3).astype(np.float32) * 0.1,
            "mesh_3d_right": r.randn(b, 778, 3).astype(np.float32) * 0.1,
            "center_left": r.randn(b, 1, 3).astype(np.float32) * 0.1,
            "center_right": r.randn(b, 1, 3).astype(np.float32) * 0.1,
            "seg": r.randint(0, 3, size=(b, s, s)).astype(np.int32),
            "dense": r.rand(b, s, s, 3).astype(np.float32),
        }

    b1, b2 = mk_batch(11), mk_batch(12)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(b1["img"][:1]), left, right)
    tx = optax.sgd(1e-3, momentum=0.9)  # see unroll test for rationale

    # manual oracle: replicate steps.loss_for outside make_train_step
    def loss_for(params, stats, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        out, updates = model.apply(
            {"params": params, "batch_stats": stats}, batch["img"],
            left, right, train=True, mutable=["batch_stats"])
        ld = dir_losses(out, batch, mcfg, left.faces, right.faces,
                        fused_stages=True)
        return total_loss(ld), updates["batch_stats"]

    p0, s0 = variables["params"], variables["batch_stats"]
    g1, s1 = jax.grad(loss_for, has_aux=True)(p0, s0, b1)
    g2, s2 = jax.grad(loss_for, has_aux=True)(p0, s1, b2)
    gavg = jax.tree.map(lambda a, c: (a + c) / 2.0, g1, g2)
    state0 = create_train_state(variables, tx)
    updates, _ = tx.update(gavg, state0.opt_state, p0)
    exp_params = optax.apply_updates(p0, updates)
    # the buggy-hypothesis params: SUM instead of MEAN of micro-grads
    updates_sum, _ = tx.update(jax.tree.map(lambda g: 2.0 * g, gavg),
                               state0.opt_state, p0)
    exp_params_sum = optax.apply_updates(p0, updates_sum)

    step = make_train_step(model, tx, mcfg, left, right, donate=False,
                           grad_accum=2)
    stacked = {k: np.stack([b1[k], b2[k]]) for k in b1}
    state1, loss = step(create_train_state(variables, tx), stacked)

    assert int(state1.step) == 1  # one optimizer step for two micros
    assert np.isfinite(float(sum(jax.tree.map(float, loss).values())))
    # Scan-vs-standalone reassociates fp32 and the model's gradient
    # crosses discrete boundaries (splat masks, sort ties), so exact
    # param equality is out (see test_unrolled_steps_match_sequential).
    # The discriminating check: the discrepancy must be small RELATIVE
    # TO THE APPLIED UPDATE — every classic accumulation bug (sum
    # instead of mean, params updated mid-accumulation, dropped micro
    # -batch) shifts params at ratio ~1 of the update scale.
    # sharp discriminator: on every leaf where mean-vs-sum accumulation
    # is distinguishable, the produced params must sit closer to MEAN
    # (a sum bug lands ON exp_params_sum; mid-accumulation updates and
    # dropped micro-batches also land far from MEAN)
    def closer_to_mean(a, cm, cs):
        a, cm, cs = map(np.asarray, (a, cm, cs))
        if np.max(np.abs(cm - cs)) > 1e-7:
            assert np.max(np.abs(a - cm)) < np.max(np.abs(a - cs))

    jax.tree.map(closer_to_mean, state1.params, exp_params,
                 exp_params_sum)

    def update_relative(a, c, z):
        diff = np.max(np.abs(np.asarray(a) - np.asarray(c)))
        upd = np.max(np.abs(np.asarray(c) - np.asarray(z)))
        # measured chaos ratio up to ~0.45 (this program crosses more
        # discrete boundaries than the unroll test's: splat masks and
        # pool argmaxes flip under scan-body refusion, and small
        # zero-init leaves have tiny update scales); every mechanics
        # bug reads ~1.0 and is additionally caught by closer_to_mean
        assert diff <= 0.6 * upd + 1e-6, (diff, upd)

    jax.tree.map(update_relative, state1.params, exp_params, p0)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-2, atol=1e-3),
        state1.batch_stats, s2)


def test_grad_accum_unroll_mutually_exclusive(env):
    import optax

    from dir_tpu.config import ModelConfig
    from dir_tpu.models.dir import DIR
    from dir_tpu.train.steps import make_train_step

    cfg, left, right = env
    mcfg = ModelConfig(backbone_layers=(1, 1, 1, 1))
    with pytest.raises(ValueError):
        make_train_step(DIR(mcfg), optax.sgd(1e-3), mcfg, left, right,
                        unroll=2, grad_accum=2)


@pytest.mark.slow
def test_train_step_compiler_options_plumbing(env):
    """make_train_step(compiler_options=...) reaches the jit: the step
    compiles, runs, and computes the same loss as the default-compiled
    step (options change the compile, never the math). This is the
    mechanism the XLA-knob sweep rides (tools/xla_flag_sweep.py) — the
    env-var route aborts on TPU flag names in this jaxlib."""
    import optax

    from dir_tpu.models.dir import DIR
    from dir_tpu.train.state import create_train_state
    from dir_tpu.train.steps import make_train_step

    cfg, left, right = env
    mcfg = ModelConfig(backbone_layers=(1, 1, 1, 1))
    model = DIR(mcfg)
    r = np.random.RandomState(3)
    b, s = 2, 64
    batch = {
        "img": r.randn(b, s, s, 3).astype(np.float32),
        "joint_2d_left": r.randn(b, 21, 3).astype(np.float32),
        "joint_2d_right": r.randn(b, 21, 3).astype(np.float32),
        "mesh_2d_left": r.randn(b, 778, 3).astype(np.float32),
        "mesh_2d_right": r.randn(b, 778, 3).astype(np.float32),
        "joint_3d_left": r.randn(b, 21, 3).astype(np.float32) * 0.1,
        "joint_3d_right": r.randn(b, 21, 3).astype(np.float32) * 0.1,
        "mesh_3d_left": r.randn(b, 778, 3).astype(np.float32) * 0.1,
        "mesh_3d_right": r.randn(b, 778, 3).astype(np.float32) * 0.1,
        "center_left": r.randn(b, 1, 3).astype(np.float32) * 0.1,
        "center_right": r.randn(b, 1, 3).astype(np.float32) * 0.1,
        "seg": r.randint(0, 3, size=(b, s, s)).astype(np.int32),
        "dense": r.rand(b, s, s, 3).astype(np.float32),
    }
    import jax.numpy as jnp
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    variables = model.init(jax.random.PRNGKey(0), batch["img"], left, right)
    tx = optax.sgd(1e-3)

    def run(co):
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, mcfg, left, right, donate=False,
                               compiler_options=co)
        _, loss = step(state, batch)
        return float(sum(jax.tree.leaves(loss))[()])

    # a real (CPU-registered) option name; the option may legitimately
    # change codegen, so the assertion is tight-tolerance, not bitwise
    plain = run(None)
    flagged = run({"xla_cpu_enable_fast_math": False})
    assert np.isfinite(plain)
    np.testing.assert_allclose(plain, flagged, rtol=1e-5)
