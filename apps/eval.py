"""Offline benchmark evaluation on InterHand2.6M (reference: apps/eval.py).

Usage:
    python apps/eval.py --model <ckpt> --data_path ./data/interhand2.6m \
        --mano_path ./assets/mano [--bs 64] [--root_joint 0] [--no-scale] \
        [--out ./result/dir_tpu]

--model accepts either an orbax checkpoint directory (saved by the
trainer) or a torch ``.pth`` from the reference (converted on the fly).
Prints the summary block and writes the per-sample error dumps the
reference produces (apps/eval.py:271-306).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", type=str, default="./DIR.pth")
    ap.add_argument("--data_path", type=str, default="./data/interhand2.6m")
    ap.add_argument("--mano_path", type=str, default="./assets/mano")
    ap.add_argument("--bs", type=int, default=64)
    ap.add_argument("--root_joint", type=int, default=0)  # 0 wrist, 9 MCP
    ap.add_argument("--no-scale", dest="scale", action="store_false")
    ap.add_argument("--out", type=str, default="./result/dir_tpu")
    ap.add_argument("--dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--backbone_layers", type=str, default="3,4,6,3",
                    help="comma-separated resnet stage depths")
    ap.add_argument("--synthetic_mano", action="store_true",
                    help="use the synthetic test MANO (smoke runs)")
    ap.add_argument("--stage", type=int, default=-1,
                    help="stage to evaluate (-1 = final refinement, the "
                         "reference's stage_num-1; apps/eval.py:170)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="batches per device dispatch (lax.map stacking; "
                         "amortizes remote-dispatch RPC overhead, "
                         "identical per-batch outputs)")
    ap.add_argument("--stem", type=str, default="conv7",
                    choices=["conv7", "s2d"],
                    help="backbone stem: conv7 (torch layout) or s2d "
                         "(space-to-depth rewrite, exact, faster on TPU; "
                         "imported stems are converted automatically)")
    ap.add_argument("--fused_bottleneck", action="store_true",
                    help="fused Pallas bottleneck inference kernels for "
                         "the early backbone (TPU; ~6%% faster eval, "
                         "bf16-trunk numerics)")
    ap.add_argument("--quant_backbone", action="store_true",
                    help="int8 PTQ backbone convs (ops/quant.py): ~2x "
                         "MXU rate + half the conv bytes; PTQ numerics "
                         "(~1e-2) — a serving option, NOT for parity "
                         "metric reproduction")
    ap.add_argument("--quant_decoder", action="store_true",
                    help="int8 PTQ decoder Residual convs (same "
                         "caveats as --quant_backbone)")
    ap.add_argument("--quant_aux", action="store_true",
                    help="int8 PTQ auxiliary convs: stem, AttentionPool, "
                         "fusion/head convs (config.py:quant_aux_eval; "
                         "same caveats as --quant_backbone)")
    ap.add_argument("--quant_static", action="store_true",
                    help="static (calibrated) activation scales: one "
                         "calibration pass over the first batch, then "
                         "no per-conv reductions at serving time")
    ap.add_argument("--resume_every", type=int, default=200,
                    help="dump the metric accumulators to "
                         "<out>/eval_resume.<cfg-hash>.npz every N "
                         "batches and "
                         "auto-resume from it on restart (0 disables). "
                         "Makes the full-test-set parity run through "
                         "the flaky tunnel survivable: a multi-hour "
                         "outage costs at most N batches of rework.")
    ap.add_argument("--devices", type=int, default=1,
                    help="data-parallel eval: shard each batch over a 1-D "
                         "mesh of N local devices (weights replicated, "
                         "per-sample outputs unchanged). The reference "
                         "is single-GPU (apps/eval.py:104); this is the "
                         "TPU-pod equivalent of its batch loop.")
    opt = ap.parse_args()

    if opt.quant_static and not (opt.quant_backbone or opt.quant_decoder
                                 or opt.quant_aux):
        ap.error("--quant_static requires --quant_backbone, "
                 "--quant_decoder and/or --quant_aux")
    if opt.fused_bottleneck and opt.dtype != "bfloat16":
        # The kernel's fp32 VMEM temporaries overflow the 16 MB budget at
        # the production 64x64x256 shape (ops/pallas_bottleneck.py) —
        # the flag is only supported on the bf16 trunk.
        ap.error("--fused_bottleneck requires --dtype bfloat16")

    import jax
    # The box's sitecustomize registers the tunneled TPU backend and can
    # programmatically override JAX_PLATFORMS; re-assert the caller's
    # env choice through the config (the reliable route — CLAUDE.md).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dir_tpu.config import ModelConfig
    from dir_tpu.data.interhand import InterHandDataset
    from dir_tpu.data.loader import BatchLoader
    from dir_tpu.mano import load_mano_pair
    from dir_tpu.models.dir import DIR
    from dir_tpu.train import checkpoint as ckpt
    from dir_tpu.train import evaluate
    from dir_tpu.utils.logger import setup_logger

    logger = setup_logger(name="dir_tpu.eval")
    os.makedirs(opt.out, exist_ok=True)

    if opt.synthetic_mano:
        from dir_tpu.mano import synthetic_mano, fix_left_shapedirs
        mano_r = synthetic_mano("right", seed=0)
        mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    else:
        mano_l, mano_r = load_mano_pair(opt.mano_path)
    layers = tuple(int(x) for x in opt.backbone_layers.split(","))
    cfg = ModelConfig(root_joint=opt.root_joint, dtype=opt.dtype,
                      backbone_layers=layers, backbone_stem=opt.stem,
                      fused_bottleneck_eval=opt.fused_bottleneck,
                      quant_backbone_eval=opt.quant_backbone,
                      quant_decoder_eval=opt.quant_decoder,
                      quant_aux_eval=opt.quant_aux,
                      quant_static=opt.quant_static)
    model = DIR(cfg)

    img0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    # jitted init: eager init round-trips the device tunnel per op.
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img0,
                                    mano_l, mano_r)

    if opt.model == "random":
        logger.info("random-init smoke evaluation")
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
        logger.info("loading trainer checkpoint %s", opt.model)
        params, stats = ckpt.load_checkpoint_weights(
            os.path.dirname(opt.model) or ".", os.path.basename(opt.model))
        variables = {
            "params": ckpt.prune_to_target(params, variables["params"]),
            "batch_stats": ckpt.prune_to_target(stats,
                                                variables["batch_stats"]),
        }

    # Data-parallel mesh: batch axis sharded, weights replicated. The
    # forward + metric program is batch-parallel, so per-sample outputs
    # equal the single-device run on the same batch
    # (tests/test_apps_cli.py::test_eval_cli_sharded, incl. the quant
    # path — whose dynamic activation scales are whole-batch |max|
    # reductions, i.e. cheap scalar all-reduces under sharding with
    # unchanged semantics). --fused_bottleneck is refused: pallas_call
    # has no SPMD partitioning rule, so the sharded operand would be
    # all-gathered (or fail) at every fused block — unmeasured, so
    # unsupported rather than silently slow.
    mesh = None
    if opt.devices > 1:
        from dir_tpu.parallel.mesh import (make_mesh, replicated_sharding,
                                           shard_batch)
        if opt.bs % opt.devices:
            ap.error("--bs must be divisible by --devices")
        if opt.fused_bottleneck:
            ap.error("--devices does not compose with --fused_bottleneck "
                     "(Pallas kernels don't partition under GSPMD)")
        mesh = make_mesh(opt.devices)
        variables = jax.device_put(variables, replicated_sharding(mesh))

    def place(x, stacked=False):
        """Host array -> device, batch-sharded when a mesh is active
        (single-hop placement via mesh.shard_batch)."""
        if mesh is not None:
            return shard_batch(x, mesh, leading_steps=stacked)
        return jnp.asarray(x)

    ds = InterHandDataset(opt.data_path, "test", mano_l, mano_r,
                          augment_train=False)
    loader = BatchLoader(ds, opt.bs, shuffle=False, drop_last=False,
                         pad_last=True, num_threads=4)
    logger.info("evaluating %d samples", len(ds))

    if opt.quant_static:
        # One calibration pass on the first batch fills the
        # "quant_stats" amax collection (ops/quant.py:module_act_scale);
        # serving then reads the stored scales with no per-conv
        # reductions. More batches would only tighten the tails —
        # maxes accumulate monotonically if this loop is extended.
        from dir_tpu.ops.quant import calibrate_static_scales
        # synchronous single batch: no prefetch thread, no epoch advance
        first = loader.peek_batch()
        variables = calibrate_static_scales(
            model, variables, jnp.asarray(first["img"]), mano_l, mano_r)
        logger.info("calibrated static int8 scales on one batch of %d",
                    first["img"].shape[0])

    jreg_l = evaluate.extended_j_regressor(mano_l)
    jreg_r = evaluate.extended_j_regressor(mano_r)

    # Variables as an explicit jit argument — closure capture inlines the
    # weights into the serialized program (tunnel remote-compile rejects
    # large bodies with HTTP 413, and constants bloat every recompile).
    @jax.jit
    def _forward(v, img):
        out = model.apply(v, img, mano_l, mano_r, train=False)
        f = out["stages"][opt.stage]
        return (f["pd_mesh_xyz_left"], f["pd_mesh_xyz_right"],
                f["pd_offset"])

    # --unroll N: stack N consecutive batches and run them in one
    # device dispatch via lax.map — the remote-device RPC overhead
    # (~3 ms/execute through this box's tunnel, bench.py) amortizes
    # across N. Per-batch outputs are identical.
    @jax.jit
    def _forward_stacked(v, imgs):
        return jax.lax.map(lambda im: _forward(v, im), imgs)

    def forward(img):
        return _forward(variables, img)

    dump = {k: [] for k in ("joint_left", "joint_right", "vert_left",
                            "vert_right", "joint2d_left", "joint2d_right",
                            "vert2d_left", "vert2d_right", "root",
                            "joints_xyz_left", "joints_xyz_right")}

    # --- resume machinery: periodic accumulator checkpoints ------------
    # The error dumps are per-sample and order-preserving, so the whole
    # eval state is (accumulated arrays, batches consumed). The config
    # fingerprint guards against resuming a different run's file.
    import hashlib as _hashlib
    import json as _json
    # every flag that changes per-sample OUTPUTS must be in here —
    # resuming across a mismatch silently mixes accumulators from two
    # different model configurations
    config_fp = _json.dumps({
        "model": opt.model, "data_path": opt.data_path, "bs": opt.bs,
        "root_joint": opt.root_joint, "scale": opt.scale,
        "stage": opt.stage, "dtype": opt.dtype,
        "backbone_layers": opt.backbone_layers, "stem": opt.stem,
        "quant": [opt.quant_backbone, opt.quant_decoder, opt.quant_static,
                  opt.quant_aux],
        "mano": [opt.mano_path, opt.synthetic_mano],
        "fused_bottleneck": opt.fused_bottleneck,
    }, sort_keys=True)
    # the file name carries the fingerprint: two different configs
    # sharing --out each keep their own checkpoint — neither overwrites
    # (mid-run saves) nor deletes (completion) the other's progress
    fp_hash = _hashlib.sha1(config_fp.encode()).hexdigest()[:8]
    resume_path = os.path.join(opt.out, f"eval_resume.{fp_hash}.npz")
    # one-time migration from the pre-hash file name: an interrupted
    # multi-hour run saved before the rename must not restart at batch 0
    legacy_path = os.path.join(opt.out, "eval_resume.npz")
    if (opt.resume_every and not os.path.exists(resume_path)
            and os.path.exists(legacy_path)):
        try:
            legacy = np.load(legacy_path, allow_pickle=False)
            if str(legacy["_config"]) == config_fp:
                os.replace(legacy_path, resume_path)
                logger.info("migrated legacy %s -> %s",
                            legacy_path, resume_path)
            else:
                logger.warning("legacy %s ignored: config fingerprint "
                               "differs (left in place)", legacy_path)
        except Exception as e:  # corrupt/foreign file: never block eval
            logger.warning("legacy %s unreadable (%s); ignored",
                           legacy_path, e)
    start_batch = 0
    if opt.resume_every and os.path.exists(resume_path):
        saved = np.load(resume_path, allow_pickle=False)
        if str(saved["_config"]) == config_fp:
            start_batch = int(saved["_batches_done"])
            for k in dump:
                if len(saved[k]):
                    dump[k] = [saved[k]]
            logger.info("resuming eval at batch %d/%d from %s",
                        start_batch, len(loader), resume_path)
        else:
            logger.warning("ignoring %s: config fingerprint differs",
                           resume_path)

    def save_resume(batches_done: int) -> None:
        arrs = {k: (np.concatenate(v, axis=0) if v
                    else np.zeros((0,), np.float32))
                for k, v in dump.items()}
        tmp = resume_path + ".tmp.npz"  # .npz suffix: savez won't append
        np.savez(tmp, _batches_done=batches_done, _config=config_fp, **arrs)
        os.replace(tmp, resume_path)  # atomic swap

    # interval tracked against the last save, not modulo: the unroll
    # path advances `consumed` by opt.unroll per flush, so a modulo test
    # fires only at multiples of lcm(unroll, resume_every) — possibly
    # never within the test set
    last_saved = start_batch

    def maybe_save(batches_done: int) -> None:
        nonlocal last_saved
        if opt.resume_every and batches_done - last_saved >= opt.resume_every:
            save_resume(batches_done)
            last_saved = batches_done
            logger.info("checkpointed eval accumulators at batch %d",
                        batches_done)

    def accumulate(batch):
        vl, vr, off = forward(place(batch["img"]))
        errs = evaluate.batch_errors(
            vl, vr, off,
            place(batch["mesh_3d_left"]),
            place(batch["mesh_3d_right"]),
            place(batch["camera"]), jreg_l, jreg_r,
            root_joint=opt.root_joint, scale_align=opt.scale)
        n = int(batch["_valid"])
        for k in dump:
            dump[k].append(np.asarray(errs[k])[:n])

    if opt.unroll > 1:
        pending = []

        def flush():
            if not pending:
                return
            if len(pending) < opt.unroll:
                # tail group: run per-batch — a shorter stack would
                # trigger a fresh (expensive) compile for one dispatch
                for b in pending:
                    accumulate(b)
            else:
                imgs = place(np.stack([b["img"] for b in pending]),
                             stacked=True)
                vls, vrs, offs = _forward_stacked(variables, imgs)
                for i, b in enumerate(pending):
                    b = dict(b)
                    b["_fwd"] = (vls[i], vrs[i], offs[i])
                    _accumulate_precomputed(b)
            pending.clear()

        def _accumulate_precomputed(batch):
            vl, vr, off = batch.pop("_fwd")
            errs = evaluate.batch_errors(
                vl, vr, off,
                place(batch["mesh_3d_left"]),
                place(batch["mesh_3d_right"]),
                place(batch["camera"]), jreg_l, jreg_r,
                root_joint=opt.root_joint, scale_align=opt.scale)
            n = int(batch["_valid"])
            for k in dump:
                dump[k].append(np.asarray(errs[k])[:n])

        consumed = start_batch
        for batch in loader.iter_from(start_batch):
            pending.append(batch)
            if len(pending) == opt.unroll:
                flush()
                consumed += opt.unroll
                maybe_save(consumed)
        flush()
    else:
        for bi, batch in enumerate(loader.iter_from(start_batch),
                                   start=start_batch + 1):
            accumulate(batch)
            maybe_save(bi)

    d = {k: np.concatenate(v, axis=0) for k, v in dump.items()}
    if opt.resume_every and os.path.exists(resume_path):
        os.remove(resume_path)  # complete: drop the partial state
        # (ours by construction — the path carries the config hash)
    np.savetxt(f"{opt.out}/left_joint.txt",
               d["joints_xyz_left"].reshape(-1, 63) * 1000, fmt="%.3f")
    np.savetxt(f"{opt.out}/right_joint.txt",
               d["joints_xyz_right"].reshape(-1, 63) * 1000, fmt="%.3f")
    np.savetxt(f"{opt.out}/joint_left_error.txt", d["joint_left"] * 1000,
               fmt="%.3f")
    np.savetxt(f"{opt.out}/joint_right_error.txt", d["joint_right"] * 1000,
               fmt="%.3f")
    np.savetxt(f"{opt.out}/mesh_left_error.txt",
               d["vert_left"].mean(-1) * 1000, fmt="%.3f")
    np.savetxt(f"{opt.out}/mesh_right_error.txt",
               d["vert_right"].mean(-1) * 1000, fmt="%.3f")
    np.savetxt(f"{opt.out}/joint_2d_left_error.txt", d["joint2d_left"],
               fmt="%.3f")
    np.savetxt(f"{opt.out}/joint_2d_right_error.txt", d["joint2d_right"],
               fmt="%.3f")
    np.savetxt(f"{opt.out}/mesh_2d_left_error.txt",
               d["vert2d_left"].mean(-1), fmt="%.3f")
    np.savetxt(f"{opt.out}/mesh_2d_right_error.txt",
               d["vert2d_right"].mean(-1), fmt="%.3f")
    np.savetxt(f"{opt.out}/root_loss.txt", d["root"] * 1000, fmt="%.3f")

    jl = d["joint_left"].mean() * 1000
    jr = d["joint_right"].mean() * 1000
    vl_ = d["vert_left"].mean() * 1000
    vr_ = d["vert_right"].mean() * 1000
    j2l = d["joint2d_left"].mean()
    j2r = d["joint2d_right"].mean()
    v2l = d["vert2d_left"].mean()
    v2r = d["vert2d_right"].mean()

    print("joint mean error:")
    print(f"    left: {jl} mm, right: {jr} mm")
    print(f"    all: {(jl + jr) / 2} mm")
    print("vert mean error:")
    print(f"    left: {vl_} mm, right: {vr_} mm")
    print(f"    all: {(vl_ + vr_) / 2} mm")
    print("pixel joint mean error:")
    print(f"    left: {j2l} px, right: {j2r} px")
    print(f"    all: {(j2l + j2r) / 2} px")
    print("pixel vert mean error:")
    print(f"    left: {v2l} px, right: {v2r} px")
    print(f"    all: {(v2l + v2r) / 2} px")
    print(f"root error: {d['root'].mean() * 1000} mm")

    # Machine-readable summary (consumed by tools/run_reference_parity.sh).
    import json
    print("SUMMARY " + json.dumps({
        "joint_mean_all_mm": float((jl + jr) / 2),
        "vert_mean_all_mm": float((vl_ + vr_) / 2),
        "joint2d_mean_all_px": float((j2l + j2r) / 2),
        "vert2d_mean_all_px": float((v2l + v2r) / 2),
        "root_mean_mm": float(d["root"].mean() * 1000),
    }))


if __name__ == "__main__":
    main()
