"""Tests for the rasterizer, prepare pipeline, and visualization."""

import json
import os
import pickle

import cv2 as cv
import numpy as np
import pytest

from dir_tpu.data.rasterizer import (dense_colors, mask_colors, rasterize,
                                     render_two_hands)


def _cam(size=64, f=100.0):
    return np.array([[f, 0, size / 2], [0, f, size / 2], [0, 0, 1]],
                    np.float32)


def test_rasterize_single_triangle():
    verts = np.array([[-0.1, -0.1, 1.0], [0.1, -0.1, 1.0], [0.0, 0.1, 1.0]],
                     np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    colors = np.ones((3, 3), np.float32)
    img, zbuf = rasterize(verts, faces, colors, _cam(), 64)
    assert img.max() == 1.0
    covered = (img.sum(-1) > 0).sum()
    assert 50 < covered < 1500  # triangle area in pixels
    assert np.isfinite(zbuf[zbuf != np.inf]).all()


def test_rasterize_occlusion():
    # near red triangle should occlude far blue one
    tri = np.array([[-0.1, -0.1], [0.1, -0.1], [0.0, 0.1]], np.float32)
    near = np.concatenate([tri, np.full((3, 1), 1.0)], axis=1)
    # x4 in xy at z=2 -> projected footprint 2x the near triangle's
    far = np.concatenate([tri * 4, np.full((3, 1), 2.0)], axis=1)
    faces = np.array([[0, 1, 2]], np.int32)
    red = np.tile([[1.0, 0, 0]], (3, 1)).astype(np.float32)
    blue = np.tile([[0, 0, 1.0]], (3, 1)).astype(np.float32)
    img, zb = rasterize(far, faces, blue, _cam(), 64)
    img, zb = rasterize(near, faces, red, _cam(), 64, image=img, zbuf=zb)
    center = img[32, 32]
    np.testing.assert_allclose(center, [1.0, 0, 0], atol=1e-5)
    assert (img[:, :, 2] > 0).any()  # blue ring still visible


def test_render_two_hands_mask_colors(rng):
    verts_l = rng.randn(50, 3).astype(np.float32) * 0.05
    verts_l[:, 2] += 1.0
    verts_r = verts_l + np.array([0.15, 0, 0.1], np.float32)
    faces = np.stack(
        [rng.choice(50, 3, replace=False) for _ in range(40)]).astype(
        np.int32)
    img, _ = render_two_hands(verts_l, verts_r, faces, _cam(), 64,
                              mask_colors(50, "left"),
                              mask_colors(50, "right"))
    # left renders into channel 1, right into channel 2
    assert (img[:, :, 1] > 0).any()
    assert (img[:, :, 2] > 0).any()
    assert not (img[:, :, 0] > 0).any()


def test_dense_colors_normalized(rng):
    v = rng.randn(100, 3).astype(np.float32)
    c = dense_colors(v)
    assert c.min() >= 0 and c.max() <= 1.0


def test_draw_2d_skeleton(rng):
    from dir_tpu.utils.visualize import draw_2d_skeleton
    img = np.zeros((64, 64, 3), np.uint8)
    joints = rng.uniform(5, 59, (21, 2)).astype(np.float32)
    out = draw_2d_skeleton(img, joints)
    assert out.shape == (64, 64, 3)
    assert out.sum() > 0
    assert img.sum() == 0  # input untouched


@pytest.fixture()
def raw_interhand(tmp_path, rng):
    """Fabricate a micro raw InterHand2.6M release."""
    root = tmp_path / "raw"
    split = "test"
    (root / "annotations" / split).mkdir(parents=True)
    img_dir = root / "images" / split
    img_dir.mkdir(parents=True)

    images, annotations = [], []
    for i in range(3):
        name = f"cap0/cam0/{i}.jpg"
        (img_dir / "cap0" / "cam0").mkdir(parents=True, exist_ok=True)
        cv.imwrite(str(img_dir / name),
                   rng.randint(0, 255, (512, 334, 3)).astype(np.uint8))
        images.append({"capture": 0, "camera": "0", "frame_idx": i,
                       "file_name": name})
        annotations.append({"hand_type": "interacting",
                            "hand_type_valid": 1})

    data = {"images": images, "annotations": annotations}
    cameras = {"0": {"campos": {"0": [0.0, 0.0, -800.0]},
                     "camrot": {"0": np.eye(3).tolist()},
                     "focal": {"0": [400.0, 400.0]},
                     "princpt": {"0": [167.0, 256.0]}}}
    mano = {"0": {}}
    for i in range(3):
        frame = {}
        for hand in ("left", "right"):
            frame[hand] = {
                "pose": (rng.randn(48) * 0.2).tolist(),
                "shape": (rng.randn(10) * 0.3).tolist(),
                "trans": [0.03 if hand == "right" else -0.03, 0.0, 0.0],
            }
        mano["0"][str(i)] = frame
    ann = root / "annotations" / split
    with open(ann / f"InterHand2.6M_{split}_data.json", "w") as f:
        json.dump(data, f)
    with open(ann / f"InterHand2.6M_{split}_camera.json", "w") as f:
        json.dump(cameras, f)
    with open(ann / f"InterHand2.6M_{split}_MANO_NeuralAnnot.json",
              "w") as f:
        json.dump(mano, f)
    return str(root)


def test_prepare_split_roundtrip(raw_interhand, tmp_path):
    from dir_tpu.data.prepare import prepare_split
    from dir_tpu.data.interhand import InterHandDataset
    from dir_tpu.mano import synthetic_mano, fix_left_shapedirs, TIPS_DATA

    right = synthetic_mano("right", seed=0, tips=TIPS_DATA)
    left = fix_left_shapedirs(
        synthetic_mano("left", seed=0, tips=TIPS_DATA), right)
    out = str(tmp_path / "processed")
    n = prepare_split(raw_interhand, out, "test", left, right, render=True)
    assert n == 3
    for sub in ("img", "mask", "dense", "anno"):
        assert len(os.listdir(os.path.join(out, "test", sub))) == 3

    # the processed output round-trips through the training dataset
    ds = InterHandDataset(out, "test", left, right, augment_train=False)
    s = ds[0]
    assert s["img"].shape == (256, 256, 3)
    assert np.isfinite(s["joint_3d_left"]).all()
    # stored pose is PCA: shape (1, 45)
    with open(os.path.join(out, "test", "anno", "0.pkl"), "rb") as f:
        anno = pickle.load(f)
    assert anno["mano_params"]["left"]["pose"].shape == (1, 45)
