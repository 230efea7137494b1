"""Convert checkpoints between the reference torch format and ours.

Usage:
    # torch -> orbax (import the released DIR.pth)
    python tools/convert_checkpoint.py --torch DIR.pth --out ./ckpt/dir \
        --mano_path ./assets/mano

    # orbax -> torch state_dict (.pth) for use with the reference
    python tools/convert_checkpoint.py --orbax ./ckpt/dir --name latest \
        --out DIR_export.pth --mano_path ./assets/mano
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--torch", type=str, default="")
    ap.add_argument("--orbax", type=str, default="")
    ap.add_argument("--name", type=str, default="latest")
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--mano_path", type=str, default="./assets/mano")
    opt = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import load_mano_pair, synthetic_mano, \
        fix_left_shapedirs
    from dir_tpu.models.dir import DIR
    from dir_tpu.train import checkpoint as ckpt
    from dir_tpu.train.state import TrainState

    try:
        mano_l, mano_r = load_mano_pair(opt.mano_path)
    except FileNotFoundError:
        mano_r = synthetic_mano("right", seed=0)
        mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)

    cfg = ModelConfig()
    model = DIR(cfg)
    img = jnp.zeros((1, 256, 256, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), img, mano_l, mano_r))

    if opt.torch:
        params, stats = ckpt.load_torch_dir_checkpoint(opt.torch)
        params = ckpt.prune_to_target(params, shapes["params"])
        stats = ckpt.prune_to_target(stats, shapes["batch_stats"])
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=stats, opt_state=None)
        ckpt.save_checkpoint(os.path.dirname(opt.out) or ".", state, 0,
                             os.path.basename(opt.out))
        print(f"wrote orbax checkpoint {opt.out}")
    elif opt.orbax:
        import torch
        params, stats = ckpt.load_checkpoint_weights(opt.orbax, opt.name)
        sd = ckpt.export_torch_dir_state(
            ckpt.prune_to_target(params, shapes["params"]),
            ckpt.prune_to_target(stats, shapes["batch_stats"]))
        torch.save({"net": {k: torch.from_numpy(v.copy())
                            for k, v in sd.items()}}, opt.out)
        print(f"wrote torch checkpoint {opt.out}")
    else:
        ap.error("one of --torch / --orbax is required")


if __name__ == "__main__":
    main()
