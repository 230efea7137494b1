"""Config YAML round-trip tests."""

import dataclasses

from dir_tpu.config import (Config, DataConfig, ModelConfig, TrainConfig,
                            load_yaml, save_yaml)


def test_yaml_roundtrip(tmp_path):
    cfg = Config(
        model=ModelConfig(dtype="bfloat16", backbone_layers=(1, 1, 1, 1)),
        data=DataConfig(data_dir="/x", device_pipeline=True),
        train=TrainConfig(batch_size=8, lr=1e-3),
    )
    p = str(tmp_path / "cfg.yaml")
    save_yaml(cfg, p)
    back = load_yaml(p)
    assert back == cfg
    assert isinstance(back.model.backbone_layers, tuple)


def test_yaml_partial_keeps_defaults(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text("train:\n  batch_size: 4\n")
    cfg = load_yaml(str(p))
    assert cfg.train.batch_size == 4
    assert cfg.model.joint_num == 21  # default preserved


def test_opt_steps_per_epoch_accounts_for_grad_accum():
    """Schedule quantum = optimizer steps, not micro-batches: with
    grad_accum=N the step counter advances once per N loader batches,
    so the epoch-quantized lr schedule must divide by N (advisor
    finding r3: cosine decayed N x too slowly in wall epochs)."""
    from dir_tpu.train.trainer import opt_steps_per_epoch

    assert opt_steps_per_epoch(6400, 64, 1) == 100
    assert opt_steps_per_epoch(6400, 64, 4) == 25
    # never zero, even for tiny datasets
    assert opt_steps_per_epoch(10, 64, 4) == 1

    # end-to-end through the schedule: after one wall epoch of data
    # (100 micro-batches, grad_accum=4 -> 25 optimizer steps), the
    # cosine lr must equal the epoch-1 value, not the epoch-0 value.
    from dir_tpu.train.state import lr_schedule
    cfg = TrainConfig(total_epochs=10, lr=1e-3, lr_scheduler="cosine")
    sched = lr_schedule(cfg, steps_per_epoch=opt_steps_per_epoch(6400, 64, 4))
    import numpy as np
    lr_e0 = float(sched(0))
    lr_after_epoch = float(sched(25))
    assert np.isclose(lr_e0, 1e-3)
    assert np.isclose(lr_after_epoch,
                      1e-3 * 0.5 * (1 + np.cos(np.pi * 1 / 10)))
