"""Fused on-device data pipeline: decode on host, everything else on TPU.

The reference runs MANO GT synthesis and the whole augmentation stack
per-sample inside DataLoader worker processes (dataset/interhand.py:
116-253) — CPU-bound at scale. Here the host path is reduced to JPEG
decode + pickle read; one jitted XLA program per batch then performs:

  * batched MANO forward for both hands (stored params -> GT verts /
    joints, camera transform, projection),
  * random horizontal flip with left/right swap,
  * global rotation/scale/translation affine warp of image, mask and
    dense maps (bilinear, border-replicate) with matching 2D label
    transform and 3D re-lift through the intrinsics,
  * motion blur (random line kernel), brightness/Gaussian noise,
  * segmentation decode from mask colors, ImageNet normalization.

Distributions match the reference's augmentation
(utils/utils.py:462-533); bit-parity with cv2 resampling is not a goal
for train-time augmentation (eval uses no augmentation).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from dir_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from dir_tpu.mano.assets import ManoModel
from dir_tpu.mano.layer import mano_forward_rotmat

_BLUR_K = 9  # max motion-blur kernel size (reference samples 3..10)


def _affine_mats(key, b, img_size, scale_factor=0.1, rot_deg=180.0,
                 transl=10.0):
    """Per-sample forward affine (3, 3): rotate+scale about center, then
    translate (utils/utils.py:298-347)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = 1.0 + jax.random.uniform(k1, (b,), minval=-scale_factor,
                                     maxval=scale_factor)
    theta = jnp.deg2rad(jax.random.uniform(k2, (b,), minval=-rot_deg,
                                           maxval=rot_deg))
    tx = jax.random.uniform(k3, (b,), minval=-transl, maxval=transl)
    ty = jax.random.uniform(k4, (b,), minval=-transl, maxval=transl)

    c = img_size / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # M = T * S * R with rotation/scale both centered at (c, c):
    # linear part A = s * R; offset = c - A @ c + t
    a00 = scale * cos
    a01 = -scale * sin
    a10 = scale * sin
    a11 = scale * cos
    ox = c - (a00 * c + a01 * c) + tx
    oy = c - (a10 * c + a11 * c) + ty
    m = jnp.stack([jnp.stack([a00, a01, ox], -1),
                   jnp.stack([a10, a11, oy], -1)], axis=1)  # (B, 2, 3)
    return m, theta


def _invert_affine(m: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, 3) forward -> inverse map for gather-based warping."""
    a, b_, c = m[:, 0, 0], m[:, 0, 1], m[:, 0, 2]
    d, e, f = m[:, 1, 0], m[:, 1, 1], m[:, 1, 2]
    det = a * e - b_ * d
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ia, ib = e / det, -b_ / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return jnp.stack([jnp.stack([ia, ib, ic], -1),
                      jnp.stack([id_, ie, if_], -1)], axis=1)


def warp_images(imgs: jnp.ndarray, m_fwd: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear affine warp with border-replicate.

    imgs: (B, H, W, C) float; m_fwd: (B, 2, 3) forward affine (dst =
    M @ src); equivalent to cv2.warpAffine(INTER_LINEAR,
    BORDER_REPLICATE) up to resampling details.
    """
    b, h, w, c = imgs.shape
    minv = _invert_affine(m_fwd)
    ys, xs = jnp.mgrid[0:h, 0:w]
    ones = jnp.ones_like(xs)
    dst = jnp.stack([xs, ys, ones], axis=-1).astype(imgs.dtype)  # (H, W, 3)
    src = jnp.einsum("bij,hwj->bhwi", minv, dst)  # (B, H, W, 2) [x, y]
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def tap(xi, yi, wgt):
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yc * w + xc
        flat = imgs.reshape(b, h * w, c)
        vals = jnp.take_along_axis(flat, idx.reshape(b, h * w, 1), axis=1)
        return vals.reshape(b, h, w, c) * wgt[..., None]

    return (tap(x0, y0, (1 - fx) * (1 - fy))
            + tap(x0 + 1, y0, fx * (1 - fy))
            + tap(x0, y0 + 1, (1 - fx) * fy)
            + tap(x0 + 1, y0 + 1, fx * fy))


def motion_blur(key, imgs: jnp.ndarray, prob: float = 0.3) -> jnp.ndarray:
    """Per-sample random line-kernel blur applied with probability
    ``prob`` (utils/utils.py:525-533 flavor)."""
    b = imgs.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    angle = jax.random.uniform(k1, (b,), minval=-np.pi, maxval=np.pi)
    length = jax.random.uniform(k2, (b,), minval=1.5, maxval=_BLUR_K / 2)
    apply = jax.random.uniform(k3, (b,)) < prob

    r = jnp.arange(_BLUR_K) - (_BLUR_K - 1) / 2
    yy, xx = jnp.meshgrid(r, r, indexing="ij")
    # soft line kernel: distance of each tap to the oriented line segment
    ca, sa = jnp.cos(angle)[:, None, None], jnp.sin(angle)[:, None, None]
    along = xx[None] * ca + yy[None] * sa
    perp = -xx[None] * sa + yy[None] * ca
    mask = ((jnp.abs(along) <= length[:, None, None])
            & (jnp.abs(perp) <= 0.6)).astype(imgs.dtype)
    ident = jnp.zeros((_BLUR_K, _BLUR_K), imgs.dtype).at[
        (_BLUR_K - 1) // 2, (_BLUR_K - 1) // 2].set(1.0)
    kernel = jnp.where(apply[:, None, None], mask, ident[None])
    kernel = kernel / jnp.sum(kernel, axis=(1, 2), keepdims=True)

    def blur_one(img, k):
        # depthwise conv: one kernel shared by the 3 channels
        k4 = jnp.tile(k[:, :, None, None], (1, 1, 1, img.shape[-1]))
        return jax.lax.conv_general_dilated(
            img[None], k4, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=img.shape[-1])[0]

    return jax.vmap(blur_one)(imgs, kernel)


def add_noise(key, imgs: jnp.ndarray, noise: float = 0.01,
              alpha: float = 0.3, beta: float = 0.05) -> jnp.ndarray:
    """Brightness + Gaussian noise on [0, 255] images
    (utils/utils.py:445-452)."""
    b = imgs.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.uniform(k1, (b, 1, 1, 3), minval=1 - alpha,
                           maxval=1 + alpha)
    off = 255.0 * beta * jax.random.uniform(k2, (b, 1, 1, 1), minval=-1,
                                            maxval=1)
    g = 255.0 * noise * jax.random.normal(k3, imgs.shape)
    return jnp.clip(imgs * a + off + g, 0, 255)


def seg_from_mask(mask: jnp.ndarray, flipped: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 3) BGR mask floats [0,255] -> (B, H, W) int32 labels
    (dataset/interhand.py:206-215); flipped: (B,) bool swaps labels."""
    g, r = mask[..., 1], mask[..., 2]
    hand = (g > 50) | (r > 50)
    left = hand & (g >= r)
    right = hand & (g < r)
    f = flipped[:, None, None]
    seg = jnp.where(left, jnp.where(f, 2, 1), 0)
    seg = jnp.where(right, jnp.where(f, 1, 2), seg)
    return seg.astype(jnp.int32)


def make_preprocess_fn(mano_left: ManoModel, mano_right: ManoModel,
                       img_size: int = 256, train: bool = True):
    """Build the jitted preprocessing step.

    Input batch (host-collated, all numpy/uint8-ish):
        img, mask, dense: (B, S, S, 3) uint8 BGR
        R_left/right: (B, 3, 3); pose_*: (B, 45); shape_*: (B, 10);
        trans_*: (B, 3); cam_R: (B, 3, 3); cam_t: (B, 3);
        camera: (B, 3, 3)
    Output: the model/loss batch of dir_tpu.models.losses.dir_losses.
    """

    @functools.partial(jax.jit, static_argnames=())
    def preprocess(raw: Dict[str, jnp.ndarray], key) -> Dict[str, jnp.ndarray]:
        b = raw["img"].shape[0]
        img = raw["img"].astype(jnp.float32)
        mask = raw["mask"].astype(jnp.float32)
        dense = raw["dense"].astype(jnp.float32)

        # --- batched MANO GT synthesis (both hands) ---
        gt = {}
        for side, ml in (("left", mano_left), ("right", mano_right)):
            verts, joints = mano_forward_rotmat(
                ml, raw[f"R_{side}"], raw[f"pose_{side}"],
                raw[f"shape_{side}"], trans=raw[f"trans_{side}"],
                center_idx=None)
            verts = jnp.einsum("bvc,bdc->bvd", verts, raw["cam_R"]) + \
                raw["cam_t"][:, None]
            joints = jnp.einsum("bjc,bdc->bjd", joints, raw["cam_R"]) + \
                raw["cam_t"][:, None]
            gt[f"verts_{side}"] = verts
            gt[f"joints_{side}"] = joints

        cam = raw["camera"]

        def project(x):
            p = jnp.einsum("bnc,bdc->bnd", x, cam)
            return p[..., :2] / p[..., 2:]

        uv = {k: project(v) for k, v in gt.items()}

        if train:
            kf, ka, kb, kn = jax.random.split(key, 4)
            # --- flip with left/right swap ---
            do_flip = jax.random.uniform(kf, (b,)) < 0.5
            fmask = do_flip[:, None, None, None]

            def flip_img(x):
                return jnp.where(fmask, x[:, :, ::-1], x)

            img, mask, dense = map(flip_img, (img, mask, dense))
            fl = do_flip[:, None, None]

            def flip_uv(x):
                fx = jnp.stack([img_size - x[..., 0] - 1, x[..., 1]], -1)
                return jnp.where(fl, fx, x)

            new_uv = {}
            new_gt = {}
            for side, other in (("left", "right"), ("right", "left")):
                new_uv[f"verts_{side}"] = flip_uv(jnp.where(
                    fl, uv[f"verts_{other}"], uv[f"verts_{side}"]))
                new_uv[f"joints_{side}"] = flip_uv(jnp.where(
                    fl, uv[f"joints_{other}"], uv[f"joints_{side}"]))
                w = do_flip[:, None, None]
                new_gt[f"verts_{side}"] = jnp.where(
                    w, gt[f"verts_{other}"], gt[f"verts_{side}"])
                new_gt[f"joints_{side}"] = jnp.where(
                    w, gt[f"joints_{other}"], gt[f"joints_{side}"])
            uv, gt = new_uv, new_gt

            # --- motion blur + affine + noise ---
            img = motion_blur(kb, img)
            m_fwd, _ = _affine_mats(ka, b, img_size)
            img = warp_images(img, m_fwd)
            mask = warp_images(mask, m_fwd)
            dense = warp_images(dense, m_fwd)

            def warp_uv_lift(u, depth):
                uw = jnp.einsum("bij,bnj->bni", m_fwd[:, :, :2], u) + \
                    m_fwd[:, None, :, 2]
                fx = cam[:, 0:1, 0:1]
                fy = cam[:, 1:2, 1:2]
                fu = cam[:, 0:1, 2:3]
                fv = cam[:, 1:2, 2:3]
                x = (uw[..., 0:1] - fu) * depth / fx
                y = (uw[..., 1:2] - fv) * depth / fy
                return uw, jnp.concatenate([x, y, depth], -1)

            out_uv, out_gt = {}, {}
            for k in ("verts_left", "verts_right", "joints_left",
                      "joints_right"):
                out_uv[k], out_gt[k] = warp_uv_lift(uv[k], gt[k][..., 2:])
            uv, gt = out_uv, out_gt

            img = add_noise(kn, img)
        else:
            do_flip = jnp.zeros((b,), bool)

        seg = seg_from_mask(mask, do_flip)
        rgb = img[..., ::-1] / 255.0
        img_norm = (rgb - jnp.asarray(IMAGENET_MEAN)) / \
            jnp.asarray(IMAGENET_STD)
        # Dense GT stays BGR — the reference feeds cv.imread order
        # straight to the dense head (dataset/interhand.py:226).
        dense_norm = dense / 255.0

        def nuv(u, x3):
            return jnp.concatenate(
                [u / img_size * 2 - 1, x3[..., 2:]], axis=-1)

        return {
            "img": img_norm,
            "seg": seg,
            "dense": dense_norm,
            "joint_2d_left": nuv(uv["joints_left"], gt["joints_left"]),
            "joint_2d_right": nuv(uv["joints_right"], gt["joints_right"]),
            "mesh_2d_left": nuv(uv["verts_left"], gt["verts_left"]),
            "mesh_2d_right": nuv(uv["verts_right"], gt["verts_right"]),
            "joint_3d_left": gt["joints_left"],
            "joint_3d_right": gt["joints_right"],
            "mesh_3d_left": gt["verts_left"],
            "mesh_3d_right": gt["verts_right"],
            "center_left": gt["joints_left"][:, 9:10],
            "center_right": gt["joints_right"][:, 9:10],
            "camera": cam,
        }

    return preprocess


class RawInterHandDataset:
    """Minimal host-side reader: JPEG decode + anno pkl only.

    Pairs with make_preprocess_fn: everything else happens on device.
    Same on-disk layout as dir_tpu.data.interhand.InterHandDataset.
    """

    def __init__(self, data_path: str, split: str, img_size: int = 256):
        import os.path as osp
        from glob import glob
        self.data_path = data_path
        self.split = split
        self.img_size = img_size
        self.size = len(glob(osp.join(data_path, split, "anno", "*.pkl")))

    def __len__(self):
        return self.size

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        import os.path as osp
        import pickle
        import cv2 as cv
        sp = self.split
        img = cv.imread(osp.join(self.data_path, sp, "img", f"{idx}.jpg"))
        mask = cv.imread(osp.join(self.data_path, sp, "mask", f"{idx}.jpg"))
        dense = cv.imread(osp.join(self.data_path, sp, "dense",
                                   f"{idx}.jpg"))
        with open(osp.join(self.data_path, sp, "anno", f"{idx}.pkl"),
                  "rb") as f:
            data = pickle.load(f)
        out = {
            "img": img.astype(np.uint8),
            "mask": mask.astype(np.uint8),
            "dense": dense.astype(np.uint8),
            "cam_R": np.asarray(data["camera"]["R"], np.float32),
            "cam_t": np.asarray(data["camera"]["t"], np.float32),
            "camera": np.asarray(data["camera"]["camera"], np.float32),
        }
        for side in ("left", "right"):
            p = data["mano_params"][side]
            out[f"R_{side}"] = np.asarray(p["R"], np.float32).reshape(3, 3)
            out[f"pose_{side}"] = np.asarray(
                p["pose"], np.float32).reshape(-1)
            out[f"shape_{side}"] = np.asarray(
                p["shape"], np.float32).reshape(10)
            out[f"trans_{side}"] = np.asarray(
                p["trans"], np.float32).reshape(3)
        return out
