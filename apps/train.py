"""Training entry point (reference: train.py).

Usage:
    python apps/train.py --data_dir ./data/interhand2.6m \
        --mano_path ./assets/mano --output ./output/dir_tpu \
        [--batch_size 64] [--epochs 50] [--lr 5e-4] [--dtype bfloat16] \
        [--resume <ckpt_dir>] [--imagenet <resnet50 state-dict .pth>]

Unlike the reference's editable config singleton, every knob is an
explicit CLI flag over the typed Config.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", type=str, default="./data/interhand2.6m")
    ap.add_argument("--mano_path", type=str, default="./assets/mano")
    ap.add_argument("--output", type=str, default="./output/dir_tpu")
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--lr_scheduler", type=str, default="cosine",
                    choices=["cosine", "step"])
    ap.add_argument("--root_joint", type=int, default=0)
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--seed", type=int, default=25)
    ap.add_argument("--num_workers", type=int, default=4)
    ap.add_argument("--resume", type=str, default="")
    ap.add_argument("--imagenet", type=str, default="",
                    help="torchvision resnet50 state-dict file to seed the "
                         "backbone (models/dir.py:490-498 equivalent)")
    ap.add_argument("--devices", type=int, default=0,
                    help="data-parallel devices (0 = all)")
    ap.add_argument("--config", type=str, default="",
                    help="YAML config; CLI flags override nothing when set")
    ap.add_argument("--phase", type=str, default="train",
                    choices=["train", "test"],
                    help="'test' runs the metric eval only (reference "
                         "Tester, train.py:246-336)")
    ap.add_argument("--device_pipeline", action="store_true",
                    help="fused on-device preprocessing (host decodes only)")
    ap.add_argument("--packed_cache", action="store_true",
                    help="serve samples from the packed decode-once mmap "
                         "cache (build with tools/build_sample_cache.py); "
                         "hot loop pays augmentation only")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="micro-batches accumulated into one optimizer "
                         "step (effective batch = batch_size * this)")
    opt = ap.parse_args()

    from dir_tpu.config import (Config, DataConfig, ModelConfig,
                                TrainConfig, load_yaml)
    from dir_tpu.mano import load_mano_pair
    from dir_tpu.parallel.mesh import make_mesh
    from dir_tpu.train.trainer import Trainer

    if opt.config:
        cfg = load_yaml(opt.config)
    else:
        cfg = Config(
            model=ModelConfig(root_joint=opt.root_joint, dtype=opt.dtype),
            data=DataConfig(data_dir=opt.data_dir,
                            num_workers=opt.num_workers,
                            device_pipeline=opt.device_pipeline,
                            packed_cache=opt.packed_cache),
            train=TrainConfig(batch_size=opt.batch_size,
                              total_epochs=opt.epochs,
                              lr=opt.lr, lr_scheduler=opt.lr_scheduler,
                              seed=opt.seed, output_dir=opt.output,
                              checkpoint=opt.resume,
                              continue_train=bool(opt.resume),
                              grad_accum=opt.grad_accum),
            mano_assets=opt.mano_path,
        )
    mano_l, mano_r = load_mano_pair(opt.mano_path)
    mesh = make_mesh(opt.devices if opt.devices else None)

    trainer = Trainer(cfg, mano_l, mano_r, mesh=mesh)
    trainer.make_data()

    init_params = init_stats = None
    if opt.imagenet:
        import torch
        from dir_tpu.train import checkpoint as ckpt
        sd = torch.load(opt.imagenet, map_location="cpu",
                        weights_only=False)
        sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
        bk_params, bk_stats = ckpt.import_torch_resnet50(sd)
        init_params = {"backbone": bk_params}
        init_stats = {"backbone": bk_stats}
        trainer.logger.info("seeded backbone from %s", opt.imagenet)

    trainer.make_model()
    if init_params is not None:
        from dir_tpu.train import checkpoint as ckpt
        params = dict(trainer.state.params)
        params["backbone"] = ckpt.prune_to_target(
            init_params["backbone"], trainer.state.params["backbone"])
        stats = dict(trainer.state.batch_stats)
        stats["backbone"] = ckpt.prune_to_target(
            init_stats["backbone"], trainer.state.batch_stats["backbone"])
        trainer.state = trainer.state.replace(params=params,
                                              batch_stats=stats)

    if opt.phase == "test":
        summary = trainer.evaluate(all_stages=True)
        trainer.logger.info("eval done; final MPJPE %.4f mm",
                            summary["joint_mean_all_mm"])
        return

    best = trainer.train()
    trainer.logger.info("training done; best MPJPE %.4f mm", best)


if __name__ == "__main__":
    main()
