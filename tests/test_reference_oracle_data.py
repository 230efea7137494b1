"""Parity tests driving the reference's OWN data pipeline and eval
metric code (the last two parity surfaces VERDICT r2 flagged as verified
only by re-implemented oracles).

  * The ACTUAL ``dataset/interhand.py`` ``InterHandDataset.__getitem__``
    (aug disabled; its data-side torch ManoLayer loaded from synthetic
    pkls) runs on our synthetic on-disk dataset and every GT tensor is
    compared against ``dir_tpu.data.interhand.InterHandDataset``.
  * The ACTUAL metric block of ``apps/eval.py:140-241`` (extracted from
    source and exec'd — see reference_oracle.extract_eval_metric_block)
    runs on random predictions vs ``dir_tpu.train.evaluate``.

Plus deterministic-parameter oracle tests for the aug transforms
(flip / affine 3D), the zero-pose local frame builder, and the
``new_skel`` knuckle remap.
"""

import os
import pickle
import sys
from types import SimpleNamespace

import numpy as np
import pytest
import torch

sys.path.insert(0, os.path.dirname(__file__))
import reference_oracle as oracle  # noqa: E402

oracle.install()


@pytest.fixture(scope="module")
def mano_pkls(tmp_path_factory):
    d = tmp_path_factory.mktemp("mano_pkls")
    return oracle.write_data_mano_pkls(str(d))


@pytest.fixture(scope="module")
def our_manos():
    """Our synthetic models with the data-side fingertip indices
    (models/manolayer.py:297 uses the right-hand tips for both sides)."""
    from dir_tpu.mano.assets import TIPS_DATA, synthetic_mano
    return (synthetic_mano("left", seed=0, tips=TIPS_DATA),
            synthetic_mano("right", seed=0, tips=TIPS_DATA))


@pytest.fixture(scope="module")
def disk_dataset(tmp_path_factory, our_manos):
    from dir_tpu.data import synthetic
    d = tmp_path_factory.mktemp("interhand_synth")
    synthetic.generate(str(d), our_manos[0], our_manos[1], split="test",
                       num_samples=4, seed=3)
    return str(d)


def _ref_dataset(mano_pkls, data_path, split="test"):
    """Construct the reference InterHandDataset with get_mano_path routed
    to the synthetic pkls and the unconditional photometric noise
    (dataset/interhand.py:218) disabled for determinism."""
    import dataset.interhand as ref_ih

    ref_ih.get_mano_path = lambda: mano_pkls
    ds = ref_ih.InterHandDataset(data_path, split)
    # add_noise is random (utils/utils.py:446-452); identity-patch the
    # instance's toolbox so the comparison is deterministic.
    ds.imgAug.add_noise = lambda img, noise=0.0, **k: img.astype(np.uint8)
    return ds


def test_ref_dataset_getitem_parity(mano_pkls, disk_dataset, our_manos):
    """Reference __getitem__ (dataset/interhand.py:116-253, aug off) ==
    our InterHandDataset on every GT tensor."""
    from dir_tpu.data.interhand import InterHandDataset

    ref = _ref_dataset(mano_pkls, disk_dataset)
    ours = InterHandDataset(disk_dataset, "test", our_manos[0],
                            our_manos[1], augment_train=False)
    assert len(ref) == len(ours) == 4

    for idx in range(4):
        inputs, targets, meta = ref[idx]
        got = ours[idx]

        # image: ref CHW normalized RGB vs ours HWC
        np.testing.assert_allclose(
            got["img"].transpose(2, 0, 1), inputs["img"], atol=1e-6,
            err_msg=f"img {idx}")
        # seg: ref (1,S,S) float of {0,1,2} vs ours (S,S) int32
        np.testing.assert_array_equal(
            got["seg"].astype(np.float32), targets["seg"][0],
            err_msg=f"seg {idx}")
        # dense: ref CHW (BGR kept) vs ours HWC
        np.testing.assert_allclose(
            got["dense"].transpose(2, 0, 1), targets["dense"], atol=1e-6,
            err_msg=f"dense {idx}")

        for k, tol in (("joint_2d_left", 2e-5), ("joint_2d_right", 2e-5),
                       ("mesh_2d_left", 2e-5), ("mesh_2d_right", 2e-5),
                       ("joint_3d_left", 1e-5), ("joint_3d_right", 1e-5),
                       ("mesh_3d_left", 1e-5), ("mesh_3d_right", 1e-5)):
            np.testing.assert_allclose(got[k], targets[k], atol=tol,
                                       err_msg=f"{k} {idx}")
        np.testing.assert_allclose(got["camera"], meta["camera"], atol=0)
        np.testing.assert_allclose(got["center_left"], meta["center_left"],
                                   atol=1e-5)
        np.testing.assert_allclose(got["center_right"],
                                   meta["center_right"], atol=1e-5)


def test_ref_aug_flip_parity(rng):
    """imgUtils.flip (utils/utils.py:476-494) == augment.flip_images_labels."""
    from utils.utils import imgUtils

    from dir_tpu.data import augment

    imgs = [rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
            for _ in range(3)]
    labels = [rng.uniform(0, 64, (21, 2)).astype(np.float32)
              for _ in range(2)]
    want_imgs, want_labels = imgUtils.flip(
        [i.copy() for i in imgs], [l.copy() for l in labels], 64)
    got_imgs, got_labels = augment.flip_images_labels(
        [i.copy() for i in imgs], [l.copy() for l in labels], 64)
    for g, w in zip(got_imgs, want_imgs):
        np.testing.assert_array_equal(g, w)
    for g, w in zip(got_labels, want_labels):
        np.testing.assert_allclose(g, w, atol=0)


def test_ref_aug_affine3d_parity(rng):
    """imgUtils.data_augmentation_3D (utils/utils.py:406-441) ==
    augment.affine_3d at fixed aug parameters (incl. the cv2 warp and
    the uvd->xyz 3D re-lift)."""
    from utils.utils import imgUtils

    from dir_tpu.data import augment

    S = 64
    cam = np.array([[500.0, 0, S / 2], [0, 500.0, S / 2], [0, 0, 1]],
                   np.float32)
    imgs = [rng.randint(0, 255, (S, S, 3)).astype(np.uint8)
            for _ in range(3)]
    l2d = [rng.uniform(5, S - 5, (21, 2)).astype(np.float32)
           for _ in range(2)]
    depth = [rng.uniform(0.4, 0.7, (21, 1)).astype(np.float32)
             for _ in range(2)]

    theta, scale, u, v = 37.0, 1.07, 4.0, -6.0
    want_imgs, want_2d, want_3d, _ = imgUtils.data_augmentation_3D(
        theta, scale, u, v, cam, [i.copy() for i in imgs],
        [x.copy() for x in l2d], [d.copy() for d in depth], img_size=S)
    got_imgs, got_2d, got_3d = augment.affine_3d(
        theta, scale, u, v, cam, [i.copy() for i in imgs],
        [x.copy() for x in l2d], [d.copy() for d in depth], S)
    for g, w in zip(got_imgs, want_imgs):
        np.testing.assert_array_equal(g, w)
    for g, w in zip(got_2d, want_2d):
        np.testing.assert_allclose(g, w, atol=1e-4)
    for g, w in zip(got_3d, want_3d):
        np.testing.assert_allclose(g, w, atol=1e-5)


@pytest.mark.parametrize("root_joint", [0, 9])
def test_ref_eval_metric_block(mano_pkls, root_joint, rng):
    """The ACTUAL apps/eval.py:140-241 metric block (exec'd from source)
    on random predictions == dir_tpu.train.evaluate.{batch_errors,
    batch_metrics} for both root_joint branches."""
    import jax.numpy as jnp

    from dir_tpu.mano.assets import synthetic_mano
    from dir_tpu.train import evaluate as ev

    ref_eval = oracle.load_ref_eval_module()
    block = oracle.extract_eval_metric_block()

    B = 3
    cam = np.tile(np.array([[530.0, 0, 128], [0, 530.0, 128], [0, 0, 1]],
                           np.float32), (B, 1, 1))
    scale = 0.1

    def verts(off):
        return (rng.randn(B, 778, 3) * scale
                + np.array([0, 0, 0.6]) + off).astype(np.float32)

    gt_vl, gt_vr = verts([-0.05, 0, 0]), verts([0.05, 0, 0])
    pd_vl, pd_vr = verts([-0.05, 0, 0]), verts([0.05, 0, 0])
    pd_off = rng.randn(B, 3).astype(np.float32)

    # Reference-side: Jr built from the data-side torch ManoLayer's
    # J_regressor (apps/eval.py:113-118), network stubbed to return the
    # canned final-stage predictions.
    import models.manolayer as ref_ml
    mano_layer = {s: ref_ml.ManoLayer(mano_pkls[s], center_idx=None)
                  for s in ("left", "right")}
    J_regressor = {s: ref_eval.Jr(mano_layer[s].J_regressor, device="cpu")
                   for s in ("left", "right")}

    result = [None, None, {
        "pd_offset": torch.from_numpy(pd_off),
        "pd_mesh_xyz_left": torch.from_numpy(pd_vl),
        "pd_mesh_xyz_right": torch.from_numpy(pd_vr),
    }]
    # The 2D joint GTs (data[6]/data[8]) are overwritten inside the block
    # (eval.py:153-154), but the 2D vert GTs (data[7]/data[9]) are used
    # as-is: they are the dataset's projection of the uncentered GT verts
    # (dataset/interhand.py:80-81).
    def project_uv(v):
        p = v @ cam[0].T
        return torch.from_numpy(p[:, :, :2] / p[:, :, 2:])

    dummy = torch.zeros(B)
    data = [dummy, dummy,
            torch.zeros(B, 21, 3), torch.from_numpy(gt_vl),
            torch.zeros(B, 21, 3), torch.from_numpy(gt_vr),
            torch.zeros(B, 21, 2), project_uv(gt_vl),
            torch.zeros(B, 21, 2), project_uv(gt_vr),
            torch.from_numpy(cam)]

    ns = {
        "torch": torch, "np": np, "data": data,
        "J_regressor": J_regressor, "xyz2uvd": ref_eval.xyz2uvd,
        "network": lambda inp, t, m: (result, None),
        "opt": SimpleNamespace(root_joint=root_joint, scale=True),
        "stage_num": 3,
        "joints_loss": {"left": [], "right": []},
        "verts_loss": {"left": [], "right": []},
        "joints_xyz_list": {"left": [], "right": []},
        "joints_xyz_gt_list": {"left": [], "right": []},
        "joints_2d_loss": {"left": [], "right": []},
        "verts_2d_loss": {"left": [], "right": []},
        "root_loss_list": [],
    }
    with torch.no_grad():
        exec(compile(block, "ref_apps_eval_block", "exec"), ns)

    # Our side: identical inputs through the jitted metric kernels.
    jreg = {s: ev.extended_j_regressor(synthetic_mano(s, seed=0))
            for s in ("left", "right")}
    err = {k: np.asarray(v) for k, v in ev.batch_errors(
        jnp.asarray(pd_vl), jnp.asarray(pd_vr), jnp.asarray(pd_off),
        jnp.asarray(gt_vl), jnp.asarray(gt_vr), jnp.asarray(cam),
        jreg["left"], jreg["right"], root_joint=root_joint,
        scale_align=True).items()}

    np.testing.assert_allclose(err["joint_left"],
                               ns["joints_loss"]["left"][0], atol=1e-5)
    np.testing.assert_allclose(err["joint_right"],
                               ns["joints_loss"]["right"][0], atol=1e-5)
    np.testing.assert_allclose(err["vert_left"],
                               ns["verts_loss"]["left"][0], atol=1e-5)
    np.testing.assert_allclose(err["vert_right"],
                               ns["verts_loss"]["right"][0], atol=1e-5)
    # 2D pixel errors run through a divide-by-depth; fp32 summation-order
    # differences (torch matmul vs XLA einsum) show up at ~1e-4 relative
    # on O(100 px) values.
    for k, ref_k in (("joint2d_left", "joints_2d_loss"),
                     ("joint2d_right", "joints_2d_loss"),
                     ("vert2d_left", "verts_2d_loss"),
                     ("vert2d_right", "verts_2d_loss")):
        side = k.split("_")[1]
        np.testing.assert_allclose(err[k], ns[ref_k][side][0],
                                   rtol=5e-4, atol=2e-3, err_msg=k)
    np.testing.assert_allclose(err["root"],
                               ns["root_loss_list"][0][:, 0], atol=1e-5)
    np.testing.assert_allclose(err["joints_xyz_left"],
                               ns["joints_xyz_list"]["left"][0], atol=1e-5)
    np.testing.assert_allclose(err["joints_xyz_left_gt"],
                               ns["joints_xyz_gt_list"]["left"][0],
                               atol=1e-5)

    # batch_metrics sums / count == the reference's flat means
    # (apps/eval.py:284-292) since every sample is valid.
    mets = {k: float(v) for k, v in ev.batch_metrics(
        jnp.asarray(pd_vl), jnp.asarray(pd_vr), jnp.asarray(pd_off),
        jnp.asarray(gt_vl), jnp.asarray(gt_vr), jnp.asarray(cam),
        jreg["left"], jreg["right"], jnp.ones(B), root_joint=root_joint,
        scale_align=True).items()}
    s = ev.summarize(mets)
    np.testing.assert_allclose(
        s["joint_mean_left_mm"],
        ns["joints_loss"]["left"][0].mean() * 1000, atol=1e-2)
    np.testing.assert_allclose(
        s["vert_mean_right_mm"],
        ns["verts_loss"]["right"][0].mean() * 1000, atol=1e-2)
    np.testing.assert_allclose(
        s["root_mean_mm"],
        ns["root_loss_list"][0].mean() * 1000, atol=1e-2)


def test_ref_online_evaluate(mano_pkls, tmp_path, rng):
    """The reference's in-training metric — InterHandDataset.evaluate
    (dataset/interhand.py:262-315, joint-9 root, GT from targets) ==
    dir_tpu.train.evaluate.online_batch_metrics."""
    import jax.numpy as jnp

    from dir_tpu.train.evaluate import online_batch_metrics

    ds = _ref_dataset(mano_pkls, str(tmp_path))  # empty dir: size 0 is fine

    B = 3

    def pts(n):
        return (rng.randn(B, n, 3) * 0.1
                + np.array([0, 0, 0.6])).astype(np.float32)

    gt_j_l, gt_j_r = pts(21), pts(21)
    gt_v_l, gt_v_r = pts(778), pts(778)
    pd_j_l, pd_j_r = pts(21), pts(21)
    pd_v_l, pd_v_r = pts(778), pts(778)

    outs = {"pd_joint_xyz_left": torch.from_numpy(pd_j_l),
            "pd_joint_xyz_right": torch.from_numpy(pd_j_r),
            "pd_mesh_xyz_left": torch.from_numpy(pd_v_l),
            "pd_mesh_xyz_right": torch.from_numpy(pd_v_r)}
    targets = {"joint_3d_left": torch.from_numpy(gt_j_l),
               "joint_3d_right": torch.from_numpy(gt_j_r),
               "mesh_3d_left": torch.from_numpy(gt_v_l),
               "mesh_3d_right": torch.from_numpy(gt_v_r)}
    with torch.no_grad():
        want = ds.evaluate(outs, targets, {})  # (jl, jr, vl, vr) in mm

    got = {k: float(v) for k, v in online_batch_metrics(
        jnp.asarray(pd_j_l), jnp.asarray(pd_j_r),
        jnp.asarray(pd_v_l), jnp.asarray(pd_v_r),
        jnp.asarray(gt_j_l), jnp.asarray(gt_j_r),
        jnp.asarray(gt_v_l), jnp.asarray(gt_v_r),
        jnp.ones(B)).items()}
    n = got["count"]
    np.testing.assert_allclose(got["joint_left_sum_m"] / n * 1000,
                               float(want[0]), rtol=1e-5)
    np.testing.assert_allclose(got["joint_right_sum_m"] / n * 1000,
                               float(want[1]), rtol=1e-5)
    np.testing.assert_allclose(got["vert_left_sum_m"] / n * 1000,
                               float(want[2]), rtol=1e-5)
    np.testing.assert_allclose(got["vert_right_sum_m"] / n * 1000,
                               float(want[3]), rtol=1e-5)


def test_ref_local_frames(mano_pkls, rng):
    """Data-side get_local_frame (models/manolayer.py:218-228 +
    build_mano_frame :63-97) == dir_tpu.mano.frames.local_frames."""
    import jax.numpy as jnp
    import models.manolayer as ref_ml

    from dir_tpu.mano.assets import synthetic_mano
    from dir_tpu.mano.frames import local_frames

    ref = ref_ml.ManoLayer(mano_pkls["right"], center_idx=None)
    # NOT batch 3: the reference's torch.cross calls omit dim=, and
    # torch's legacy default picks the FIRST size-3 dimension — at B=3
    # that is the batch axis (models/manolayer.py:53,80), silently
    # changing the math. B=4 exercises the intended semantics.
    betas = (rng.randn(4, 10) * 0.5).astype(np.float32)
    with torch.no_grad():
        want = ref.get_local_frame(torch.from_numpy(betas)).numpy()
    got = np.asarray(local_frames(synthetic_mano("right", seed=0),
                                  jnp.asarray(betas)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_ref_new_skel(mano_pkls, rng):
    """new_skel knuckle remap (models/manolayer.py:317-321) ==
    NumpyMano(..., new_skel=True)."""
    import models.manolayer as ref_ml

    from dir_tpu.data.mano_np import NumpyMano
    from dir_tpu.mano.assets import TIPS_DATA, synthetic_mano

    ref = ref_ml.ManoLayer(mano_pkls["right"], center_idx=None,
                           new_skel=True)
    ours = NumpyMano(synthetic_mano("right", seed=0, tips=TIPS_DATA))

    from scipy.spatial.transform import Rotation as R
    root = R.random(random_state=7).as_matrix().astype(
        np.float32).reshape(1, 3, 3)
    pose = (rng.randn(1, 45) * 0.3).astype(np.float32)
    shape = (rng.randn(1, 10) * 0.5).astype(np.float32)
    trans = np.array([[0.02, -0.01, 0.6]], np.float32)

    with torch.no_grad():
        want_v, want_j = ref(torch.from_numpy(root),
                             torch.from_numpy(pose),
                             torch.from_numpy(shape),
                             trans=torch.from_numpy(trans))
    got_v, got_j = ours(root, pose, shape, trans=trans, center_idx=None,
                        new_skel=True)
    np.testing.assert_allclose(got_v, want_v.numpy(), atol=1e-5)
    np.testing.assert_allclose(got_j, want_j.numpy(), atol=1e-5)
