"""Fused on-device preprocessing pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dir_tpu.data import synthetic
from dir_tpu.data.device_pipeline import (RawInterHandDataset,
                                          make_preprocess_fn, warp_images,
                                          seg_from_mask)
from dir_tpu.data.interhand import InterHandDataset
from dir_tpu.data.loader import BatchLoader, collate
from dir_tpu.mano import synthetic_mano, fix_left_shapedirs, TIPS_DATA


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    right = synthetic_mano("right", seed=0, tips=TIPS_DATA)
    left = fix_left_shapedirs(
        synthetic_mano("left", seed=0, tips=TIPS_DATA), right)
    d = str(tmp_path_factory.mktemp("dev_data"))
    synthetic.generate(d, left, right, split="test", num_samples=4)
    return d, left, right


def test_eval_path_matches_host_pipeline(env):
    """train=False device preprocessing == the host (numpy) dataset."""
    data_dir, left, right = env
    raw_ds = RawInterHandDataset(data_dir, "test")
    host_ds = InterHandDataset(data_dir, "test", left, right,
                               augment_train=False)
    raw = collate([raw_ds[i] for i in range(4)])
    raw = {k: jnp.asarray(v) for k, v in raw.items()}

    fn = make_preprocess_fn(left, right, train=False)
    got = fn(raw, jax.random.PRNGKey(0))
    want = collate([host_ds[i] for i in range(4)])

    np.testing.assert_allclose(np.asarray(got["img"]), want["img"],
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got["seg"]), want["seg"])
    np.testing.assert_allclose(np.asarray(got["dense"]), want["dense"],
                               atol=1e-5)
    for k in ("joint_3d_left", "mesh_3d_right", "joint_2d_left",
              "mesh_2d_right", "center_left", "center_right"):
        np.testing.assert_allclose(np.asarray(got[k]), want[k], atol=2e-4,
                                   err_msg=k)


def test_train_path_augments(env):
    data_dir, left, right = env
    raw_ds = RawInterHandDataset(data_dir, "test")
    raw = collate([raw_ds[i] for i in range(4)])
    raw = {k: jnp.asarray(v) for k, v in raw.items()}

    fn = make_preprocess_fn(left, right, train=True)
    a = fn(raw, jax.random.PRNGKey(1))
    b = fn(raw, jax.random.PRNGKey(2))
    c = fn(raw, jax.random.PRNGKey(1))

    # different keys -> different augmentation; same key -> deterministic
    assert not np.allclose(np.asarray(a["img"]), np.asarray(b["img"]))
    np.testing.assert_allclose(np.asarray(a["img"]), np.asarray(c["img"]))
    for k, v in a.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    assert set(np.unique(np.asarray(a["seg"]))).issubset({0, 1, 2})
    # uv labels stay in plausible normalized range after augmentation
    assert np.abs(np.asarray(a["joint_2d_left"][..., :2])).max() < 4.0


def test_warp_images_identity():
    img = jnp.asarray(np.random.RandomState(0).rand(2, 16, 16, 3)
                      .astype(np.float32))
    ident = jnp.tile(jnp.asarray([[1.0, 0, 0], [0, 1, 0]]), (2, 1, 1))
    out = warp_images(img, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_warp_images_translation():
    img = jnp.zeros((1, 8, 8, 1), jnp.float32).at[0, 2, 2, 0].set(1.0)
    m = jnp.asarray([[[1.0, 0, 3], [0, 1, 0]]])  # shift +3 in x
    out = np.asarray(warp_images(img, m))
    assert out[0, 2, 5, 0] == pytest.approx(1.0, abs=1e-5)
    assert out[0, 2, 2, 0] == pytest.approx(0.0, abs=1e-5)


def test_device_seg_decode_matches_numpy(rng):
    from dir_tpu.data.augment import seg_from_mask as np_impl
    mask = rng.randint(0, 255, (2, 16, 16, 3)).astype(np.float32)
    for flip in (False, True):
        got = np.asarray(seg_from_mask(
            jnp.asarray(mask), jnp.full((2,), flip)))
        want = np.stack([np_impl(m.astype(np.uint8), flip) for m in mask])
        np.testing.assert_array_equal(got, want)
