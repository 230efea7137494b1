"""ctypes bindings for the native image-op library with numpy fallback.

``native/libimageops.so`` fuses the per-sample hot path of the data
pipeline (affine warp, normalize, seg decode). If the library is absent
it is built on demand with make when a toolchain exists; otherwise the
numpy/cv2 implementations in dir_tpu.data.augment are used — behavior is
identical either way (tests assert parity).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_LIB_PATH = os.path.join(_NATIVE_DIR, "libimageops.so")

_lib = None


def _try_load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.affine_warp_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                   u8p, ctypes.c_int, ctypes.c_int, f32p,
                                   ctypes.c_int]
    lib.normalize_bgr_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                     f32p, f32p, f32p]
    lib.seg_from_mask_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                     ctypes.c_int, i32p]
    _lib = lib
    return lib


def available() -> bool:
    return _try_load() is not None


def affine_warp(img: np.ndarray, m2x3: np.ndarray, out_size: int,
                border: str = "constant") -> np.ndarray:
    """Bilinear affine warp, bit-identical to cv2.warpAffine's
    fixed-point INTER_LINEAR path (native or cv2).

    border="constant" (zero fill) matches the production augmentation
    (reference data_augmentation_3D, utils/utils.py:405-441, which uses
    cv2's default border); "replicate" matches the reference's other,
    unused warp (utils/utils.py:357-364)."""
    lib = _try_load()
    if lib is None:
        import cv2 as cv
        mode = (cv.BORDER_REPLICATE if border == "replicate"
                else cv.BORDER_CONSTANT)
        return cv.warpAffine(img, m2x3, dsize=(out_size, out_size),
                             flags=cv.INTER_LINEAR, borderMode=mode)
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty((out_size, out_size, 3), np.uint8)
    lib.affine_warp_u8(img, img.shape[0], img.shape[1], out, out_size,
                       out_size,
                       np.ascontiguousarray(m2x3, np.float32),
                       1 if border == "replicate" else 0)
    return out


def normalize_bgr(img: np.ndarray, mean, std) -> np.ndarray:
    """Fused BGR u8 -> normalized RGB f32 (native or numpy)."""
    lib = _try_load()
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    if lib is None:
        rgb = img[:, :, ::-1].astype(np.float32) / 255.0
        return (rgb - mean) / std
    img = np.ascontiguousarray(img, np.uint8)
    out = np.empty(img.shape[:2] + (3,), np.float32)
    lib.normalize_bgr_u8(img, img.shape[0], img.shape[1], out, mean, std)
    return out


def seg_from_mask(mask: np.ndarray, flipped: bool) -> np.ndarray:
    """3-class seg decode (native or numpy)."""
    lib = _try_load()
    if lib is None:
        from dir_tpu.data.augment import seg_from_mask as np_impl
        return np_impl(mask, flipped)
    mask = np.ascontiguousarray(mask, np.uint8)
    out = np.empty(mask.shape[:2], np.int32)
    lib.seg_from_mask_u8(mask, mask.shape[0], mask.shape[1],
                         int(flipped), out)
    return out
