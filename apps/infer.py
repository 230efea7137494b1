"""Single-image two-hand inference (BASELINE config: batch=1, 256x256).

Reads one RGB crop, runs DIR, writes the predicted MANO meshes (.obj),
parameters (.npz), and a skeleton overlay.

Usage:
    python apps/infer.py --image crop.jpg --model <ckpt|DIR.pth|random> \
        --mano_path ./assets/mano [--out ./infer_out]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import numpy as np  # noqa: E402


def _write_obj(path, verts, faces):
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces + 1:
            f.write(f"f {tri[0]} {tri[1]} {tri[2]}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=str, required=True)
    ap.add_argument("--model", type=str, default="random")
    ap.add_argument("--mano_path", type=str, default="./assets/mano")
    ap.add_argument("--out", type=str, default="./infer_out")
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--backbone_layers", type=str, default="3,4,6,3")
    ap.add_argument("--synthetic_mano", action="store_true")
    opt = ap.parse_args()

    import cv2 as cv
    import jax
    # The box's sitecustomize registers the tunneled TPU backend and can
    # programmatically override JAX_PLATFORMS; re-assert the caller's
    # env choice through the config (the reliable route — CLAUDE.md).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    from dir_tpu.config import ModelConfig
    from dir_tpu.data.augment import normalize_image
    from dir_tpu.mano import (load_mano_pair, synthetic_mano,
                              fix_left_shapedirs)
    from dir_tpu.models.dir import DIR
    from dir_tpu.train import checkpoint as ckpt
    from dir_tpu.utils.visualize import draw_2d_skeleton

    os.makedirs(opt.out, exist_ok=True)
    if opt.synthetic_mano:
        mano_r = synthetic_mano("right", seed=0)
        mano_l = fix_left_shapedirs(synthetic_mano("left", seed=0), mano_r)
    else:
        mano_l, mano_r = load_mano_pair(opt.mano_path)

    layers = tuple(int(x) for x in opt.backbone_layers.split(","))
    cfg = ModelConfig(dtype=opt.dtype, backbone_layers=layers)
    model = DIR(cfg)

    img_bgr = cv.imread(opt.image)
    img_bgr = cv.resize(img_bgr, (256, 256))
    img = jnp.asarray(normalize_image(img_bgr))[None]

    # jitted init: eager init round-trips the device tunnel per op.
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), img,
                                    mano_l, mano_r)
    if opt.model.endswith(".pth"):
        params, stats = ckpt.load_torch_dir_checkpoint(
            opt.model, backbone_layers=layers)
        variables = {
            "params": ckpt.prune_to_target(params, variables["params"]),
            "batch_stats": ckpt.prune_to_target(stats,
                                                variables["batch_stats"])}
    elif opt.model != "random":
        params, stats = ckpt.load_checkpoint_weights(
            os.path.dirname(opt.model) or ".", os.path.basename(opt.model))
        variables = {
            "params": ckpt.prune_to_target(params, variables["params"]),
            "batch_stats": ckpt.prune_to_target(stats,
                                                variables["batch_stats"])}

    # Variables passed as an argument (not a closure constant): closure
    # capture inlines every weight into the serialized program, which
    # the remote-compile tunnel rejects for full-size models (HTTP 413).
    out = jax.jit(lambda v, im: model.apply(v, im, mano_l, mano_r,
                                            train=False))(variables, img)
    final = out["stages"][-1]

    faces = np.asarray(mano_r.faces)
    for side in ("left", "right"):
        verts = np.asarray(final[f"pd_mesh_xyz_{side}"][0])
        _write_obj(os.path.join(opt.out, f"hand_{side}.obj"), verts, faces)
    np.savez(os.path.join(opt.out, "prediction.npz"),
             mano_para_left=np.asarray(final["pd_mano_para_left"][0]),
             mano_para_right=np.asarray(final["pd_mano_para_right"][0]),
             offset=np.asarray(final["pd_offset"][0]),
             joints_left=np.asarray(final["pd_joint_xyz_left"][0]),
             joints_right=np.asarray(final["pd_joint_xyz_right"][0]),
             seg=np.asarray(out["seg"][0]))

    overlay = img_bgr
    for side in ("left", "right"):
        uv = (np.asarray(final[f"pd_joint_uv_{side}"][0]) + 1) / 2 * 256
        overlay = draw_2d_skeleton(overlay, uv)
    cv.imwrite(os.path.join(opt.out, "overlay.png"), overlay)

    # 3D mesh overlay (reference: pyrender offscreen render,
    # utils/visualize.py:75-105). Predictions are root-relative; place
    # them at a nominal camera depth with a unit-focal intrinsics so the
    # ortho-style crop framing is preserved.
    from dir_tpu.utils.visualize import render_mesh_overlay
    depth = 0.5
    cam = np.array([[512.0, 0, 128.0], [0, 512.0, 128.0], [0, 0, 1.0]],
                   np.float32)
    off = np.asarray(final["pd_offset"][0]) * 0.15
    vl = np.asarray(final["pd_mesh_xyz_left"][0]) - off / 2 + [0, 0, depth]
    vr = np.asarray(final["pd_mesh_xyz_right"][0]) + off / 2 + [0, 0, depth]
    mesh_overlay = render_mesh_overlay(img_bgr, vl, vr, faces, cam,
                                       alpha=0.85)
    cv.imwrite(os.path.join(opt.out, "mesh_overlay.png"), mesh_overlay)
    print(f"wrote meshes, parameters, and overlays to {opt.out}")


if __name__ == "__main__":
    main()
