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
