"""CLI smoke tests for apps/eval.py on the synthetic dataset."""

import importlib.util
import os
import sys

import numpy as np
import pytest


def _load_app(name):
    path = os.path.join(os.path.dirname(__file__), "..", "apps",
                        f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"app_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_run_reference_parity_script(tmp_path):
    """tools/run_reference_parity.sh end-to-end on synthetic stand-ins:
    plain-numpy MANO pkls, an exported tiny-backbone torch .pth, and the
    synthetic test split."""
    import pickle
    import subprocess

    import jax
    import jax.numpy as jnp
    import torch

    from dir_tpu.config import ModelConfig
    from dir_tpu.data import synthetic
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.models.dir import DIR
    from dir_tpu.train import checkpoint as ck

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)

    # Stand-in licensed MANO pkls (plain numpy dicts).
    pkl_dir = tmp_path / "mano_pkls"
    pkl_dir.mkdir()
    for side, m in (("LEFT", left), ("RIGHT", right)):
        d = {k: np.asarray(getattr(m, a)) for k, a in (
            ("v_template", "v_template"), ("shapedirs", "shapedirs"),
            ("posedirs", "posedirs"), ("J_regressor", "j_regressor"),
            ("weights", "weights"),
            ("hands_components", "hands_components"),
            ("hands_mean", "hands_mean"))}
        d["f"] = np.asarray(m.faces, np.uint32)
        with open(pkl_dir / f"MANO_{side}.pkl", "wb") as f:
            pickle.dump(d, f)

    # Stand-in released checkpoint: random tiny DIR exported to the
    # reference torch layout.
    cfg = ModelConfig(backbone_layers=(1, 1, 1, 1))
    model = DIR(cfg)
    img = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, left, right)
    sd = ck.export_torch_dir_state(variables["params"],
                                   variables["batch_stats"],
                                   backbone_layers=(1, 1, 1, 1))
    pth = tmp_path / "DIR.pth"
    torch.save({"net": {k: torch.from_numpy(np.asarray(v))
                        for k, v in sd.items()}}, pth)

    data_dir = tmp_path / "data"
    synthetic.generate(str(data_dir), left, right, split="test",
                       num_samples=2)

    script = os.path.join(os.path.dirname(__file__), "..", "tools",
                          "run_reference_parity.sh")
    env = dict(os.environ, PARITY_BS="2", PARITY_BACKBONE="1,1,1,1",
               PARITY_COMPARE="0")
    out_dir = tmp_path / "parity_out"
    res = subprocess.run(
        ["bash", script, str(pth), str(pkl_dir), str(data_dir),
         str(out_dir)],
        env=env, capture_output=True, text=True, timeout=1200)
    assert res.returncode == 0, res.stdout + res.stderr
    assert "SUMMARY" in open(out_dir / "eval_stdout.txt").read()
    assert (out_dir / "mano" / "MANO_LEFT.npz").exists()


@pytest.mark.slow
def test_eval_cli_smoke(tmp_path, monkeypatch, capsys):
    # The box exports JAX_PLATFORMS=axon (the tunneled TPU) and the
    # apps re-assert the env's platform choice over conftest's cpu
    # config — pin cpu so in-process CLI tests never ride the tunnel
    # (ONE TPU client at a time; CLAUDE.md).
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dir_tpu.data import synthetic
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    data_dir = str(tmp_path / "data")
    synthetic.generate(data_dir, left, right, split="test", num_samples=3)
    out_dir = str(tmp_path / "out")

    app = _load_app("eval")
    monkeypatch.setattr(sys, "argv", [
        "eval", "--model", "random", "--data_path", data_dir,
        "--out", out_dir, "--bs", "2", "--backbone_layers", "1,1,1,1",
        "--synthetic_mano"])
    app.main()

    captured = capsys.readouterr().out
    assert "joint mean error" in captured
    assert os.path.exists(os.path.join(out_dir, "joint_left_error.txt"))
    errs = np.loadtxt(os.path.join(out_dir, "joint_left_error.txt"))
    assert errs.shape == (3, 21)
    assert np.isfinite(errs).all()


@pytest.mark.slow
def test_eval_cli_from_orbax_checkpoint(tmp_path, monkeypatch, capsys):
    """apps/eval.py --model <trainer checkpoint>: the orbax restore path
    (eval.py builds a TrainState template with opt_state=None and loads
    a Trainer-written 'latest') — the path tools/quant_accuracy.py
    --model uses for converged-weights measurements (VERDICT r4 #5).
    Restored weights must change the metrics vs random init."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    from dir_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from dir_tpu.data import synthetic
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.parallel.mesh import make_mesh
    from dir_tpu.train.trainer import Trainer

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    data_dir = str(tmp_path / "data")
    synthetic.generate(data_dir, left, right, split="train", num_samples=2)
    synthetic.generate(data_dir, left, right, split="test", num_samples=2,
                       seed=5)
    out_dir = str(tmp_path / "train_out")
    cfg = Config(
        model=ModelConfig(backbone_layers=(1, 1, 1, 1)),
        data=DataConfig(data_dir=data_dir, num_workers=1),
        train=TrainConfig(batch_size=2, total_epochs=1, draw_every=0,
                          eval_every_epochs=0, output_dir=out_dir))
    trainer = Trainer(cfg, left, right, mesh=make_mesh(1))
    trainer.make_data()
    trainer.make_model()
    trainer.train()
    ckpt = os.path.join(out_dir, "checkpoint", "latest")
    assert os.path.isdir(ckpt)

    app = _load_app("eval")

    def run(model):
        eval_out = str(tmp_path / f"eval_{os.path.basename(model)}")
        monkeypatch.setattr(sys, "argv", [
            "eval", "--model", model, "--data_path", data_dir,
            "--out", eval_out, "--bs", "2",
            "--backbone_layers", "1,1,1,1", "--synthetic_mano"])
        app.main()
        capsys.readouterr()
        return np.loadtxt(os.path.join(eval_out, "joint_left_error.txt"))

    from_ckpt = run(ckpt)
    assert np.isfinite(from_ckpt).all()
    from_random = run("random")
    # one optimizer step moved every weight; restored-weight metrics
    # must differ from random-init's (proves weights actually loaded)
    assert not np.allclose(from_ckpt, from_random)


@pytest.mark.slow
@pytest.mark.parametrize("quant", [False, True])
def test_eval_cli_sharded(tmp_path, monkeypatch, capsys, quant):
    """--devices 8 (1-D data mesh over the virtual CPU devices) produces
    the same per-sample errors as the single-device run on the same
    batches. quant=True additionally covers --quant_backbone/--quant
    _decoder/--quant_aux under sharding: the dynamic activation scales are whole
    -batch |max| reductions (scalar all-reduces under sharding), so the
    sharded and single-device runs still see identical scales."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")  # see eval smoke note
    import jax
    jax.config.update("jax_platforms", "cpu")
    from dir_tpu.data import synthetic
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    data_dir = str(tmp_path / "data")
    synthetic.generate(data_dir, left, right, split="test", num_samples=3)

    app = _load_app("eval")
    outs = {}
    for ndev in (1, 8):
        out_dir = str(tmp_path / f"out{ndev}")
        argv = ["eval", "--model", "random", "--data_path", data_dir,
                "--out", out_dir, "--bs", "8",
                "--backbone_layers", "1,1,1,1",
                "--synthetic_mano", "--devices", str(ndev)]
        if quant:
            argv += ["--quant_backbone", "--quant_decoder", "--quant_aux"]
        monkeypatch.setattr(sys, "argv", argv)
        app.main()
        capsys.readouterr()
        outs[ndev] = np.loadtxt(
            os.path.join(out_dir, "joint_left_error.txt"))

    assert outs[8].shape == (3, 21)
    assert np.isfinite(outs[8]).all()
    # fp path: sharding changes nothing observable. quant path: a 1-ulp
    # fp difference from partition-dependent fusion can flip an
    # activation sitting exactly on a rounding boundary by one int8
    # quantum (observed: 1/63 elements, 1e-3 mm) — allow one quantum.
    np.testing.assert_allclose(outs[8], outs[1], rtol=0,
                               atol=5e-3 if quant else 1e-4)


@pytest.mark.slow
def test_export_cli_smoke(tmp_path, monkeypatch):
    """apps/export.py end-to-end: random tiny model -> artifact ->
    --check reloads it and verifies outputs (dir_tpu/serve.py)."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")  # see eval smoke note
    import jax
    jax.config.update("jax_platforms", "cpu")
    out = str(tmp_path / "dir.stablehlo")
    app = _load_app("export")
    monkeypatch.setattr(sys, "argv", [
        "export", "--model", "random", "--synthetic_mano",
        "--backbone_layers", "1,1,1,1", "--batch", "2",
        "--out", out, "--check"])
    app.main()  # SystemExit on failed roundtrip check
    assert os.path.getsize(out) > 1_000_000  # weights embedded


@pytest.mark.slow
def test_eval_resume_matches_uninterrupted(tmp_path, monkeypatch, capsys):
    """apps/eval.py --resume_every: interrupting after 2 of 3 batches and
    rerunning produces the identical SUMMARY and per-sample dumps as one
    uninterrupted run (VERDICT r3 #7: the licensed-data parity run must
    survive a multi-hour tunnel outage)."""
    from dir_tpu.data import synthetic
    from dir_tpu.data.loader import BatchLoader
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    data_dir = str(tmp_path / "data")
    synthetic.generate(data_dir, left, right, split="test", num_samples=6)
    app = _load_app("eval")

    def run(out_dir):
        monkeypatch.setattr(sys, "argv", [
            "eval", "--model", "random", "--data_path", data_dir,
            "--out", out_dir, "--bs", "2", "--backbone_layers", "1,1,1,1",
            "--synthetic_mano", "--resume_every", "1"])
        app.main()
        out = capsys.readouterr().out
        import json
        return json.loads(next(ln for ln in out.splitlines()
                                if ln.startswith("SUMMARY "))[8:])

    # --- uninterrupted reference run ---
    want = run(str(tmp_path / "full"))

    # --- interrupted run: die after 2 of 3 batches ---
    out_dir = str(tmp_path / "resumed")
    real_iter_from = BatchLoader.iter_from

    def dying_iter_from(self, start):
        for i, b in enumerate(real_iter_from(self, start)):
            if start + i >= 2:
                raise RuntimeError("simulated tunnel outage")
            yield b

    monkeypatch.setattr(BatchLoader, "iter_from", dying_iter_from)
    with pytest.raises(RuntimeError, match="simulated tunnel outage"):
        run(out_dir)
    capsys.readouterr()
    import glob
    resume_files = glob.glob(os.path.join(out_dir, "eval_resume.*.npz"))
    assert len(resume_files) == 1  # name carries the config hash
    resume_file = resume_files[0]
    assert int(np.load(resume_file)["_batches_done"]) == 2

    # Simulate a checkpoint written before the hashed-name upgrade: the
    # resumed run must migrate eval_resume.npz to the hashed path and
    # continue from batch 2 rather than silently starting over (ADVICE
    # r4: orphaned legacy checkpoint).
    legacy_file = os.path.join(out_dir, "eval_resume.npz")
    os.replace(resume_file, legacy_file)

    # --- resumed run: completes and matches ---
    monkeypatch.setattr(BatchLoader, "iter_from", real_iter_from)
    got = run(out_dir)
    assert got == want
    assert not os.path.exists(resume_file)  # cleaned up on completion
    assert not os.path.exists(legacy_file)  # migrated, then cleaned up
    for f in ("joint_left_error.txt", "root_loss.txt", "left_joint.txt"):
        a = np.loadtxt(os.path.join(out_dir, f))
        b = np.loadtxt(os.path.join(str(tmp_path / "full"), f))
        np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_eval_resume_interval_with_unroll(tmp_path, monkeypatch, capsys):
    """--unroll advances the consumed counter by N per flush; the save
    trigger must be interval-based (batches since last save >= K), not
    `consumed % K == 0` — the modulo form fires only at multiples of
    lcm(unroll, K), possibly never within the test set."""
    import glob

    from dir_tpu.data import synthetic
    from dir_tpu.data.loader import BatchLoader
    from dir_tpu.mano import fix_left_shapedirs, synthetic_mano

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    data_dir = str(tmp_path / "data")
    synthetic.generate(data_dir, left, right, split="test",
                       num_samples=12)
    app = _load_app("eval")
    out_dir = str(tmp_path / "out")

    def run():
        # 6 batches of bs 2; unroll 2 -> consumed = 2, 4, 6;
        # resume_every 3 never divides any of them
        monkeypatch.setattr(sys, "argv", [
            "eval", "--model", "random", "--data_path", data_dir,
            "--out", out_dir, "--bs", "2", "--backbone_layers", "1,1,1,1",
            "--synthetic_mano", "--unroll", "2", "--resume_every", "3"])
        app.main()
        capsys.readouterr()

    real_iter_from = BatchLoader.iter_from

    def dying_iter_from(self, start):
        for i, b in enumerate(real_iter_from(self, start)):
            if start + i >= 5:
                raise RuntimeError("simulated tunnel outage")
            yield b

    monkeypatch.setattr(BatchLoader, "iter_from", dying_iter_from)
    with pytest.raises(RuntimeError, match="simulated tunnel outage"):
        run()
    capsys.readouterr()
    # two flushes completed (consumed = 4 >= 3): a checkpoint MUST exist
    files = glob.glob(os.path.join(out_dir, "eval_resume.*.npz"))
    assert len(files) == 1, "interval save never fired under --unroll"
    assert int(np.load(files[0])["_batches_done"]) == 4

    # resumed run completes and cleans up
    monkeypatch.setattr(BatchLoader, "iter_from", real_iter_from)
    run()
    assert not glob.glob(os.path.join(out_dir, "eval_resume.*.npz"))
