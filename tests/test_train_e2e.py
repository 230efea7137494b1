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
