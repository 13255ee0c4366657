"""ctypes bindings for the native data-loader core (native/loadercore.cpp).

Builds on first use (g++ + libpng/libjpeg, all baked into the image) and
falls back gracefully: callers check `available()` and keep the cv2 path
otherwise. CropDataset uses this when constructed with use_native=True.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libloadercore.so"))
_lib = None


def build(force: bool = False) -> bool:
    if os.path.isfile(_LIB_PATH) and not force:
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True)
        return os.path.isfile(_LIB_PATH)
    except Exception as e:  # pragma: no cover
        print(f"native loadercore build failed: {e}")
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.lc_load_sample.restype = ctypes.c_int
    lib.lc_load_sample.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int)]
    lib.lc_load_batch.restype = ctypes.c_int
    lib.lc_load_batch.argtypes = [
        ctypes.c_int, ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def load_sample(rgb_path: str, mask_path: str, mask_visib_path: str,
                bbox: np.ndarray, crop_img: int, crop_gt: int):
    """(img uint8 (S,S,3), mask_full f32 (G,G), mask_visib f32 (G,G),
    (img_w, img_h)) via the native core; raises on decode failure."""
    lib = _load()
    assert lib is not None, "native loadercore unavailable"
    img = np.empty((crop_img, crop_img, 3), np.uint8)
    mf = np.empty((crop_gt, crop_gt), np.float32)
    mv = np.empty((crop_gt, crop_gt), np.float32)
    wh = np.zeros(2, np.int32)
    b = np.ascontiguousarray(bbox, np.float64)
    rc = lib.lc_load_sample(
        rgb_path.encode(), mask_path.encode(), mask_visib_path.encode(),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), crop_img, crop_gt,
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        wh.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if rc != 0:
        raise IOError(f"loadercore failed rc={rc} for {rgb_path}")
    return img, mf, mv, (int(wh[0]), int(wh[1]))


def load_batch(rgb_paths: List[str], mask_paths: List[str],
               mask_visib_paths: List[str], bboxes: np.ndarray,
               crop_img: int, crop_gt: int, num_threads: int = 0):
    """Batched decode+crop into fresh batch arrays. Failed samples are
    zero-filled; returns (imgs, masks_full, masks_visib, n_failures)."""
    lib = _load()
    assert lib is not None, "native loadercore unavailable"
    B = len(rgb_paths)
    imgs = np.empty((B, crop_img, crop_img, 3), np.uint8)
    mf = np.empty((B, crop_gt, crop_gt), np.float32)
    mv = np.empty((B, crop_gt, crop_gt), np.float32)

    def carr(paths):
        arr = (ctypes.c_char_p * B)()
        arr[:] = [p.encode() for p in paths]
        return arr

    b = np.ascontiguousarray(bboxes, np.float64)
    fails = lib.lc_load_batch(
        B, carr(rgb_paths), carr(mask_paths), carr(mask_visib_paths),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), crop_img, crop_gt,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mv.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), num_threads)
    return imgs, mf, mv, int(fails)
