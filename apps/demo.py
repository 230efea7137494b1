"""Random-hand MANO demo (reference: manopth/manopth/demo.py).

Generates a random two-hand pose, runs the JAX MANO layer, renders the
meshes with the numpy rasterizer, and saves mask/dense/skeleton images.

Usage:
    python apps/demo.py [--mano_path ./assets/mano] [--out demo.png]
        [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))

import cv2 as cv  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mano_path", type=str, default="./assets/mano")
    ap.add_argument("--out", type=str, default="demo.png")
    ap.add_argument("--seed", type=int, default=0)
    opt = ap.parse_args()

    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation as R

    from dir_tpu.mano import (load_mano_pair, synthetic_mano,
                              fix_left_shapedirs, mano_forward_rotmat)
    from dir_tpu.data.rasterizer import (dense_colors, mask_colors,
                                         render_two_hands)
    from dir_tpu.utils.visualize import draw_2d_skeleton

    try:
        mano_l, mano_r = load_mano_pair(opt.mano_path)
    except FileNotFoundError:
        print("no MANO assets found; using the synthetic test model")
        mano_r = synthetic_mano("right", seed=1)
        mano_l = fix_left_shapedirs(synthetic_mano("left", seed=1), mano_r)

    rng = np.random.RandomState(opt.seed)
    size = 256
    cam = np.array([[500.0, 0, size / 2], [0, 500.0, size / 2], [0, 0, 1]],
                   np.float32)

    panels = []
    verts_np, joints_np = {}, {}
    for model, side, xoff in ((mano_l, "left", -0.06),
                              (mano_r, "right", 0.06)):
        root = R.random(random_state=rng.randint(1 << 30)).as_matrix()
        pose = jnp.asarray((rng.randn(1, 45) * 0.5).astype(np.float32))
        shape = jnp.asarray((rng.randn(1, 10) * 0.5).astype(np.float32))
        trans = jnp.asarray([[xoff, 0.0, 0.45]], jnp.float32)
        v, j = mano_forward_rotmat(
            model, jnp.asarray(root[None].astype(np.float32)), pose, shape,
            trans=trans, center_idx=None)
        verts_np[side] = np.asarray(v[0])
        joints_np[side] = np.asarray(j[0])

    faces = np.asarray(mano_r.faces)
    nv = verts_np["left"].shape[0]
    mask, _ = render_two_hands(verts_np["left"], verts_np["right"], faces,
                               cam, size, mask_colors(nv, "left"),
                               mask_colors(nv, "right"))
    dense, _ = render_two_hands(
        verts_np["left"], verts_np["right"], faces, cam, size,
        dense_colors(np.asarray(mano_l.v_template)),
        dense_colors(np.asarray(mano_r.v_template)))
    panels.append((mask * 255).astype(np.uint8))
    panels.append((dense * 255).astype(np.uint8))

    skel = np.zeros((size, size, 3), np.uint8)
    for side in ("left", "right"):
        p = joints_np[side] @ cam.T
        skel = draw_2d_skeleton(skel, p[:, :2] / p[:, 2:])
    panels.append(skel)

    cv.imwrite(opt.out, np.concatenate(panels, axis=1))
    print(f"wrote {opt.out}")


if __name__ == "__main__":
    main()
