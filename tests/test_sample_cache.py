"""Packed decode-once sample cache (dir_tpu/data/sample_cache.py).

The cache must be output-IDENTICAL to the JPEG-path dataset: same
sample dicts for the same (seed, idx, epoch), both with and without
augmentation — otherwise a cached training run silently trains on
different data than the reference-format run it claims to equal."""

import numpy as np
import pytest

from dir_tpu.data import synthetic
from dir_tpu.data.interhand import InterHandDataset
from dir_tpu.data.loader import BatchLoader
from dir_tpu.data.sample_cache import CachedInterHandDataset, build_cache
from dir_tpu.mano import fix_left_shapedirs, synthetic_mano


@pytest.fixture(scope="module")
def cached_dataset_dir(tmp_path_factory):
    right = synthetic_mano("right", seed=0)
    left = fix_left_shapedirs(synthetic_mano("left", seed=0), right)
    d = str(tmp_path_factory.mktemp("cache_data"))
    synthetic.generate(d, left, right, split="train", num_samples=4)
    build_cache(d, "train", left, right, log_every=0)
    return d, left, right


def _assert_samples_equal(a: dict, b: dict):
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_cache_identical_no_aug(cached_dataset_dir):
    d, left, right = cached_dataset_dir
    ds = InterHandDataset(d, "train", left, right, augment_train=False)
    cds = CachedInterHandDataset(d, "train", left, right,
                                 augment_train=False)
    assert len(cds) == len(ds) == 4
    for i in range(len(ds)):
        _assert_samples_equal(cds[i], ds[i])


def test_cache_identical_with_aug_across_epochs(cached_dataset_dir):
    """The augmentation stream is a pure function of (seed, idx, epoch)
    and starts from bit-identical raw arrays, so augmented outputs must
    be bit-identical too — including flips, blur, warps, and noise."""
    d, left, right = cached_dataset_dir
    ds = InterHandDataset(d, "train", left, right, seed=25)
    cds = CachedInterHandDataset(d, "train", left, right, seed=25)
    for epoch in (0, 3):
        ds.epoch = cds.epoch = epoch
        for i in range(len(ds)):
            _assert_samples_equal(cds[i], ds[i])


def test_cache_through_batch_loader(cached_dataset_dir):
    """The cached dataset plugs into BatchLoader unchanged (the loader
    test VERDICT r4 #3 asks for)."""
    d, left, right = cached_dataset_dir
    cds = CachedInterHandDataset(d, "train", left, right, seed=25)
    loader = BatchLoader(cds, batch_size=2, shuffle=True, drop_last=True,
                         num_threads=2, seed=7)
    ref = BatchLoader(InterHandDataset(d, "train", left, right, seed=25),
                      batch_size=2, shuffle=True, drop_last=True,
                      num_threads=2, seed=7)
    got, want = list(loader), list(ref)
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        _assert_samples_equal(g, w)


def test_cache_guards(cached_dataset_dir, tmp_path):
    d, left, right = cached_dataset_dir
    # missing cache -> actionable error
    synthetic.generate(str(tmp_path), left, right, split="train",
                       num_samples=2)
    with pytest.raises(FileNotFoundError, match="packed cache"):
        CachedInterHandDataset(str(tmp_path), "train", left, right)
    # img_size mismatch -> refuse rather than serve wrong shapes
    with pytest.raises(ValueError, match="img_size"):
        CachedInterHandDataset(d, "train", left, right, img_size=128)
