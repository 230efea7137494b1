"""End-to-end trainer smoke on the real accelerator.

Generates a small synthetic dataset, runs the Trainer (tiny backbone,
device data pipeline) for one epoch on whatever jax.devices() offers,
evaluates, and verifies a checkpoint lands on disk.
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    import numpy as np

    from dir_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from dir_tpu.data import synthetic
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
    from dir_tpu.parallel.mesh import make_mesh
    from dir_tpu.train.trainer import Trainer

    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    tmp = tempfile.mkdtemp(prefix="dir_tpu_smoke_")
    data_dir = os.path.join(tmp, "data")
    synthetic.generate(data_dir, left, right, split="train", num_samples=8)
    synthetic.generate(data_dir, left, right, split="test", num_samples=4,
                       seed=5)

    cfg = Config(
        model=ModelConfig(backbone_layers=(1, 1, 1, 1), dtype="bfloat16"),
        data=DataConfig(data_dir=data_dir, num_workers=2,
                        device_pipeline=True),
        train=TrainConfig(batch_size=4, total_epochs=1, print_every=1,
                          draw_every=0,
                          output_dir=os.path.join(tmp, "out")),
    )
    trainer = Trainer(cfg, left, right, mesh=make_mesh(1))
    trainer.make_data()
    trainer.make_model()
    best = trainer.train()
    assert np.isfinite(best), best
    ckpt = os.path.join(cfg.train.output_dir, "checkpoint", "latest")
    assert os.path.isdir(ckpt), ckpt
    print(f"smoke ok: best={best:.2f}mm, checkpoint at {ckpt}")


if __name__ == "__main__":
    main()
