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


def test_eval_cli_smoke(tmp_path, monkeypatch, capsys):
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
