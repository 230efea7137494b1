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
    """The native warp matches cv2.warpAffine's INTER_LINEAR float path
    (OpenCV 5.x HAL) to within 1 u8 LSB on <0.2% of pixels — the
    residue is multiply-add ordering inside the closed cv2 binary —
    and is EXACT for integer transforms. Both border modes: constant
    (the production aug border, utils/utils.py:405-441) and replicate
    (the reference's unused warp, utils/utils.py:357-364)."""
    import cv2 as cv
    img = rng.randint(0, 255, (96, 96, 3)).astype(np.uint8)

    # integer transform: bit-exact
    m_id = np.array([[1.0, 0, 2.0], [0, 1.0, -3.0]], np.float32)
    got = native.affine_warp(img, m_id, 96, border="constant")
    want = cv.warpAffine(img, m_id, dsize=(96, 96), flags=cv.INTER_LINEAR,
                         borderMode=cv.BORDER_CONSTANT)
    np.testing.assert_array_equal(got, want)

    cases = [(25.0, 1.1, 3.0, -2.0), (-137.0, 0.92, -9.5, 7.25),
             (179.5, 1.09, 10.0, -10.0)]
    for theta, scale, u, v in cases:
        m = augment.get_affine_mat(theta=theta, scale=scale, u=u, v=v,
                                   size=96)[:2]
        for border, cv_mode in (("constant", cv.BORDER_CONSTANT),
                                ("replicate", cv.BORDER_REPLICATE)):
            got = native.affine_warp(img, m, 96, border=border)
            want = cv.warpAffine(img, m, dsize=(96, 96),
                                 flags=cv.INTER_LINEAR, borderMode=cv_mode)
            diff = np.abs(got.astype(int) - want.astype(int))
            tag = f"{theta},{scale},{u},{v},{border}"
            assert diff.max() <= 1, tag
            assert (diff > 0).mean() < 0.002, tag
