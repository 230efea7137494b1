"""Native image-op library parity vs the numpy/cv2 implementations."""

import numpy as np
import pytest

from dir_tpu.data import native
from dir_tpu.data import augment


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="libimageops.so not built")


@needs_native
def test_normalize_parity(rng):
    img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    got = native.normalize_bgr(img, augment.IMAGENET_MEAN,
                               augment.IMAGENET_STD)
    want = ((img[:, :, ::-1].astype(np.float32) / 255.0
             - augment.IMAGENET_MEAN) / augment.IMAGENET_STD)
    np.testing.assert_allclose(got, want, atol=1e-6)


@needs_native
def test_seg_decode_parity(rng):
    mask = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
    for flipped in (False, True):
        got = native.seg_from_mask(mask, flipped)
        want = augment.seg_from_mask(mask, flipped)
        np.testing.assert_array_equal(got, want)


@needs_native
def test_affine_warp_parity(rng):
    import cv2 as cv
    img = rng.randint(0, 255, (96, 96, 3)).astype(np.uint8)
    m = augment.get_affine_mat(theta=25.0, scale=1.1, u=3.0, v=-2.0,
                               size=96)[:2]
    got = native.affine_warp(img, m, 96)
    want = cv.warpAffine(img, m, dsize=(96, 96), flags=cv.INTER_LINEAR,
                         borderMode=cv.BORDER_REPLICATE)
    # bilinear rounding differs by at most 1 LSB on a handful of pixels
    diff = np.abs(got.astype(int) - want.astype(int))
    assert np.mean(diff <= 1) > 0.995
