"""Crop + resize ops.

Two implementations with identical geometry:
  * host-side numpy/cv2 (exact parity with the reference data pipeline,
    `checkerpose/bop_dataset_pytorch.py:39-144`) for offline dataset prep;
  * device-side jnp gather sampler (jit/vmap-able, static output shape) so the
    serving path can crop directly from full frames on TPU without host work.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

try:
    import cv2
except Exception:  # pragma: no cover - cv2 is present in this image
    cv2 = None

from checkerpose_tpu.ops.geometry import square_bbox


# ---------------------------------------------------------------------------
# host-side (exact reference semantics)
# ---------------------------------------------------------------------------

def crop_square_resize_np(img: np.ndarray, bbox, crop_size: int, interpolation: str = "linear") -> np.ndarray:
    """Zero-pad the bbox to square, crop (clipping to the image), resize.

    Mirrors reference `bop_dataset_pytorch.py:55-91` exactly, including the
    int truncation of corners.
    """
    x1, y1, bw, bh = int(bbox[0]), int(bbox[1]), int(bbox[2]), int(bbox[3])
    sq = square_bbox(np.array([x1, y1, bw, bh]))
    x1, y1, side = int(sq[0]), int(sq[1]), int(max(bh, bw))
    x2, y2 = x1 + int(sq[2]), y1 + int(sq[3])

    if img.ndim > 2:
        roi = np.zeros((side, side, img.shape[2]), dtype=img.dtype)
    else:
        roi = np.zeros((side, side), dtype=img.dtype)
    rx1 = max(-x1, 0)
    x1c = max(x1, 0)
    rx2 = rx1 + min(img.shape[1] - x1c, x2 - x1c)
    ry1 = max(-y1, 0)
    y1c = max(y1, 0)
    ry2 = ry1 + min(img.shape[0] - y1c, y2 - y1c)
    x2c = min(x2, img.shape[1])
    y2c = min(y2, img.shape[0])
    roi[ry1:ry2, rx1:rx2] = img[y1c:y2c, x1c:x2c]

    return _resize_np(roi, crop_size, interpolation)


def crop_resize_np(img: np.ndarray, bbox, crop_size: int, interpolation: str = "linear") -> np.ndarray:
    """Clip bbox to image, crop, resize (aspect NOT preserved). Reference
    `bop_dataset_pytorch.py:94-108`."""
    x1 = max(0, int(bbox[0]))
    x2 = min(img.shape[1], int(bbox[0] + bbox[2]))
    y1 = max(0, int(bbox[1]))
    y2 = min(img.shape[0], int(bbox[1] + bbox[3]))
    return _resize_np(img[y1:y2, x1:x2], crop_size, interpolation)


def _resize_np(img: np.ndarray, crop_size: int, interpolation: str) -> np.ndarray:
    if cv2 is not None:
        interp = cv2.INTER_LINEAR if interpolation == "linear" else cv2.INTER_NEAREST
        return cv2.resize(img, (crop_size, crop_size), interpolation=interp)
    # PIL fallback
    from PIL import Image
    mode_resample = Image.BILINEAR if interpolation == "linear" else Image.NEAREST
    return np.asarray(Image.fromarray(img).resize((crop_size, crop_size), mode_resample))


def get_roi_np(img: np.ndarray, bbox, crop_size: int, interpolation: str, resize_method: str) -> np.ndarray:
    """Dispatcher matching reference `get_roi` (`bop_dataset_pytorch.py:132-144`)."""
    if resize_method == "crop_resize":
        return crop_resize_np(img, bbox, crop_size, interpolation)
    if resize_method in ("crop_square_resize", "crop_resize_by_warp_affine"):
        # crop_resize_by_warp_affine is geometrically equivalent to the square
        # crop+resize for rot=0 (the only rotation the reference ever uses);
        # we implement the square path for both.
        return crop_square_resize_np(img, bbox, crop_size, interpolation)
    raise NotImplementedError(f"unknown resize_method: {resize_method}")


# ---------------------------------------------------------------------------
# device-side (jit/vmap-able gather sampler)
# ---------------------------------------------------------------------------

def crop_bilinear(img: jnp.ndarray, bbox: jnp.ndarray, crop_size: int) -> jnp.ndarray:
    """Bilinear crop+resize of an HWC image to (crop_size, crop_size, C) on
    device. `bbox` is the FINAL (already squared) bbox [x, y, w, h], float.

    Geometry matches cv2.resize(INTER_LINEAR) of the zero-padded square crop:
    source coordinate of output pixel i is (i + 0.5) * w/S - 0.5 + x. Pixels
    sampled outside the image read as 0 (the reference zero-pads).
    """
    H, W = img.shape[0], img.shape[1]
    S = crop_size
    i = jnp.arange(S, dtype=jnp.float32)
    sx = (i + 0.5) * (bbox[2] / S) - 0.5 + bbox[0]
    sy = (i + 0.5) * (bbox[3] / S) - 0.5 + bbox[1]
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[None, :, None]     # (1, S, 1)
    wy = (sy - y0)[:, None, None]     # (S, 1, 1)
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    def tap(yi, xi):
        valid = ((yi >= 0) & (yi < H))[:, None] & ((xi >= 0) & (xi < W))[None, :]
        g = img[jnp.clip(yi, 0, H - 1)][:, jnp.clip(xi, 0, W - 1)]
        return g * valid[:, :, None].astype(img.dtype)

    out = (tap(y0, x0) * (1 - wy) * (1 - wx)
           + tap(y0, x0 + 1) * (1 - wy) * wx
           + tap(y0 + 1, x0) * wy * (1 - wx)
           + tap(y0 + 1, x0 + 1) * wy * wx)
    return out


def crop_nearest(img: jnp.ndarray, bbox: jnp.ndarray, crop_size: int) -> jnp.ndarray:
    """Nearest-neighbor device crop+resize of an HW (mask) image."""
    H, W = img.shape[0], img.shape[1]
    S = crop_size
    i = jnp.arange(S, dtype=jnp.float32)
    # cv2 INTER_NEAREST picks floor(i * scale); scale = w/S
    sx = jnp.floor(i * (bbox[2] / S) + bbox[0]).astype(jnp.int32)
    sy = jnp.floor(i * (bbox[3] / S) + bbox[1]).astype(jnp.int32)
    valid = ((sy >= 0) & (sy < H))[:, None] & ((sx >= 0) & (sx < W))[None, :]
    g = img[jnp.clip(sy, 0, H - 1)][:, jnp.clip(sx, 0, W - 1)]
    return g * valid.astype(img.dtype)


IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    """uint8/float HWC (or NHWC) RGB in [0,255] -> ImageNet-normalized float32.

    Matches the reference's torchvision ToTensor+Normalize
    (`bop_dataset_pytorch.py:385-398`) but stays NHWC.
    """
    x = img.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD
