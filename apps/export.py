"""Export the inference model as a serving artifact (StableHLO).

New capability over the reference (which has no deployment story —
serving apps/eval.py means shipping the repo + torch + MANO pkls and
re-tracing on the serving host). Here the jitted inference step is
lowered once and serialized with weights and MANO constants embedded;
the serving side reloads it with dir_tpu.serve.load and zero model
code.

Usage:
    python apps/export.py --model <ckpt|.pth|random> \
        --mano_path ./assets/mano --out dir.stablehlo \
        [--batch 256 | --batch 0 for symbolic] [--dtype bfloat16] \
        [--platforms tpu,cpu] [--check]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="random",
                    help="orbax checkpoint dir, torch .pth, or 'random'")
    ap.add_argument("--mano_path", type=str, default="./assets/mano")
    ap.add_argument("--synthetic_mano", action="store_true")
    ap.add_argument("--out", type=str, default="./dir.stablehlo")
    ap.add_argument("--batch", type=int, default=0,
                    help="batch size to specialize for; 0 = symbolic "
                         "(one artifact serves every batch size)")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--backbone_layers", type=str, default="3,4,6,3")
    ap.add_argument("--stem", type=str, default="conv7",
                    choices=["conv7", "s2d"])
    ap.add_argument("--quant_backbone", action="store_true",
                    help="embed the int8 PTQ backbone path in the "
                         "artifact (ops/quant.py; serving numerics)")
    ap.add_argument("--quant_decoder", action="store_true",
                    help="embed the int8 PTQ decoder-Residual path")
    ap.add_argument("--quant_aux", action="store_true",
                    help="embed the int8 PTQ aux-conv path (stem, "
                         "AttentionPool, fusion/head convs)")
    ap.add_argument("--quant_static", action="store_true",
                    help="static activation scales; calibrated on "
                         "--calib_npy images (or one random batch with "
                         "a warning) and embedded in the artifact")
    ap.add_argument("--calib_npy", type=str, default="",
                    help=".npy of (N, 256, 256, 3) float32 calibration "
                         "images for --quant_static")
    ap.add_argument("--platforms", type=str, default="",
                    help="comma-separated lowering platforms "
                         "(default: current backend)")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and verify outputs match "
                         "the live model on a random batch")
    opt = ap.parse_args()

    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dir_tpu import serve
    from dir_tpu.config import ModelConfig
    from dir_tpu.mano import load_mano_pair
    from dir_tpu.models.dir import DIR
    from dir_tpu.train import checkpoint as ckpt
    from dir_tpu.utils.logger import setup_logger

    logger = setup_logger(name="dir_tpu.export")

    if opt.synthetic_mano:
        from dir_tpu.mano import fix_left_shapedirs, synthetic_mano
        mano_r = synthetic_mano("right", seed=0)
        mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    else:
        mano_l, mano_r = load_mano_pair(opt.mano_path)
    layers = tuple(int(x) for x in opt.backbone_layers.split(","))
    if opt.quant_static and not (opt.quant_backbone or opt.quant_decoder
                                 or opt.quant_aux):
        ap.error("--quant_static requires --quant_backbone, "
                 "--quant_decoder and/or --quant_aux")
    cfg = ModelConfig(dtype=opt.dtype, backbone_layers=layers,
                      backbone_stem=opt.stem,
                      quant_backbone_eval=opt.quant_backbone,
                      quant_decoder_eval=opt.quant_decoder,
                      quant_aux_eval=opt.quant_aux,
                      quant_static=opt.quant_static)
    model = DIR(cfg)

    img0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0,
                                    mano_l, mano_r)

    if opt.model == "random":
        logger.info("exporting random-init weights (smoke)")
    elif opt.model.endswith(".pth"):
        logger.info("converting torch checkpoint %s", opt.model)
        params, stats = ckpt.load_torch_dir_checkpoint(opt.model)
        if cfg.backbone_stem == "s2d":
            params = ckpt.adapt_stem_s2d(params)
        variables = {
            "params": ckpt.prune_to_target(params, variables["params"]),
            "batch_stats": ckpt.prune_to_target(stats,
                                                variables["batch_stats"]),
        }
    else:
        params, stats = ckpt.load_checkpoint_weights(
            os.path.dirname(opt.model) or ".", os.path.basename(opt.model))
        variables = {
            "params": ckpt.prune_to_target(params, variables["params"]),
            "batch_stats": ckpt.prune_to_target(stats,
                                                variables["batch_stats"]),
        }

    if opt.quant_static:
        from dir_tpu.ops.quant import calibrate_static_scales
        if opt.calib_npy:
            imgs = np.load(opt.calib_npy).astype(np.float32)
        else:
            logger.warning("no --calib_npy: calibrating static int8 "
                           "scales on ONE RANDOM batch — fine for smoke "
                           "tests, wrong for production artifacts")
            imgs = np.random.RandomState(0).randn(
                2, 256, 256, 3).astype(np.float32)
        variables = calibrate_static_scales(model, variables,
                                            jnp.asarray(imgs),
                                            mano_l, mano_r)
        logger.info("calibrated static int8 scales on %d images",
                    imgs.shape[0])

    platforms = ([p for p in opt.platforms.split(",") if p]
                 if opt.platforms else None)
    batch = opt.batch if opt.batch > 0 else None
    logger.info("lowering (batch=%s, platforms=%s)...",
                batch or "symbolic", platforms or "current")
    blob = serve.export_infer(model, variables, mano_l, mano_r,
                              batch_size=batch, platforms=platforms)
    serve.save(opt.out, blob)
    logger.info("wrote %s (%.1f MB)", opt.out, len(blob) / 1e6)

    if opt.check:
        fn = serve.load(opt.out)
        b = batch or 2
        img = jnp.asarray(
            np.random.RandomState(0).randn(b, 256, 256, 3)
            .astype(np.float32))
        got = fn(img)["stages"][-1]["pd_mesh_xyz_left"]
        want = model.apply(variables, img, mano_l, mano_r,
                           train=False)["stages"][-1]["pd_mesh_xyz_left"]
        err = float(jnp.max(jnp.abs(got - want)))
        logger.info("roundtrip max |err| = %.2e", err)
        if not err < 1e-3:
            raise SystemExit("roundtrip check FAILED")


if __name__ == "__main__":
    main()
