"""Geometry core: projection, normalization, bbox math, grids, labels, FPS.

Pure functions. Host-side (numpy) bbox helpers keep exact int-truncation
semantics of the reference data pipeline
(`checkerpose/bop_dataset_pytorch.py:147-235`); device-side (jnp) functions
power the jitted label generator and decoders.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# projection
# ---------------------------------------------------------------------------

def project_pts(pts, K, R, t):
    """Project 3D points. pts (N,3), K (3,3), R (3,3), t (3,) or (3,1).

    Returns (uv (N,2), depth (N,)). Mirrors reference
    `bop_dataset_pytorch.py:21-36`. Works for numpy and jnp inputs and under
    vmap (no data-dependent control flow).
    """
    xp = jnp if isinstance(pts, jnp.ndarray) else np
    t = xp.reshape(t, (3,))
    cam = pts @ R.T + t[None, :]
    depth = cam[:, 2]
    proj = cam @ K.T
    uv = proj[:, :2] / proj[:, 2:3]
    return uv, depth


def pc_normalize(pc):
    """Center and scale a point cloud to the unit ball.

    Mirrors `aux_utils/pointnet2_utils.py:11-20` (the only symbol of that file
    the reference actually uses).
    """
    xp = jnp if isinstance(pc, jnp.ndarray) else np
    centroid = xp.mean(pc, axis=0)
    pc = pc - centroid
    m = xp.max(xp.sqrt(xp.sum(pc ** 2, axis=1)))
    return pc / m


# ---------------------------------------------------------------------------
# bbox helpers (host-side, exact reference semantics incl. int truncation)
# ---------------------------------------------------------------------------

def padding_bbox(bbox, padding_ratio: float) -> np.ndarray:
    """Pad bbox (x, y, w, h) about its center. Reference
    `bop_dataset_pytorch.py:147-162`."""
    x1, y1, bw, bh = float(bbox[0]), float(bbox[1]), float(bbox[2]), float(bbox[3])
    cx = x1 + 0.5 * bw
    cy = y1 + 0.5 * bh
    pw = int(bw * padding_ratio)
    ph = int(bh * padding_ratio)
    return np.array([int(cx - pw / 2), int(cy - ph / 2), pw, ph])


def aug_bbox(bbox, padding_ratio: float, rng: np.random.Generator) -> np.ndarray:
    """Randomly scale (+-25%) and shift (+-25%) a GT bbox, then pad.

    Reference `bop_dataset_pytorch.py:165-185`.
    """
    x1, y1, bw, bh = float(bbox[0]), float(bbox[1]), float(bbox[2]), float(bbox[3])
    cx = x1 + 0.5 * bw
    cy = y1 + 0.5 * bh
    scale_ratio = 1 + 0.25 * (2 * rng.random() - 1)
    shift = 0.25 * (2 * rng.random(2) - 1)
    center = np.array([cx + bw * shift[0], cy + bh * shift[1]])
    aw = int(bw * scale_ratio * padding_ratio)
    ah = int(bh * scale_ratio * padding_ratio)
    return np.array([int(center[0] - aw / 2), int(center[1] - ah / 2), aw, ah])


def square_bbox(bbox) -> np.ndarray:
    """Expand bbox to a square about its center (int-truncated corners).

    This is the `get_final_Bbox` transform for `crop_square_resize` /
    `crop_resize_by_warp_affine` (reference `bop_dataset_pytorch.py:188-220`).
    """
    x1, y1, bw, bh = float(bbox[0]), float(bbox[1]), float(bbox[2]), float(bbox[3])
    x2, y2 = x1 + bw, y1 + bh
    cx, cy = 0.5 * (x1 + x2), 0.5 * (y1 + y2)
    if bh > bw:
        x1, x2 = cx - bh / 2, cx + bh / 2
    else:
        y1, y2 = cy - bw / 2, cy + bw / 2
    x1, y1, x2, y2 = int(x1), int(y1), int(x2), int(y2)
    return np.array([x1, y1, x2 - x1, y2 - y1])


def clip_bbox(bbox, max_x: int, max_y: int) -> np.ndarray:
    """`get_final_Bbox` for plain `crop_resize` (reference
    `bop_dataset_pytorch.py:209-218`)."""
    x1 = max(int(bbox[0]), 0)
    y1 = max(int(bbox[1]), 0)
    x2 = min(int(bbox[0] + bbox[2]), max_x)
    y2 = min(int(bbox[1] + bbox[3]), max_y)
    return np.array([x1, y1, x2 - x1, y2 - y1])


def final_bbox(bbox, resize_method: str, max_x: int, max_y: int) -> np.ndarray:
    if resize_method in ("crop_square_resize", "crop_resize_by_warp_affine"):
        return square_bbox(bbox)
    elif resize_method == "crop_resize":
        return clip_bbox(bbox, max_x, max_y)
    raise NotImplementedError(resize_method)


# ---------------------------------------------------------------------------
# crop grid <-> original pixels
# ---------------------------------------------------------------------------

def roi_grid(crop_size_gt: int) -> np.ndarray:
    """(h, w, 2) grid of (x, y) pixel coordinates inside the GT crop.

    Reference precomputes this in `bop_dataset_pytorch.py:265-269`.
    """
    r = np.arange(crop_size_gt, dtype=np.float32)
    gx, gy = np.meshgrid(r, r)  # both (h, w); gx varies along w
    return np.stack([gx, gy], axis=-1)


def map_crop_to_original(pixels, bbox, crop_size: int):
    """Map crop-grid pixel coordinates (..., 2) back to original-image coords.

    original = bbox_wh / crop_size * pixel + bbox_xy. Reference
    `bop_dataset_pytorch.py:223-235`. Works for numpy or jnp, any leading dims.
    bbox is (4,) [x, y, w, h] (float or int).
    """
    ratio = jnp.stack([bbox[2] / crop_size, bbox[3] / crop_size]) \
        if isinstance(pixels, jnp.ndarray) else np.array([bbox[2] / crop_size, bbox[3] / crop_size])
    offset = bbox[:2]
    return pixels * ratio + offset


# ---------------------------------------------------------------------------
# GT label generation (device, jittable, batchable via vmap)
# ---------------------------------------------------------------------------

def make_code_labels(proj_xy: Array, bbox: Array, crop_size_gt: int):
    """Discretize 2D keypoint projections into the binary-code labels.

    Args:
      proj_xy: (N, 2) float projections in original-image pixels.
      bbox: (4,) float/int final (square) bbox [x, y, w, h].
      crop_size_gt: static int S; codes get log2(S) bits per direction.

    Returns (roi_bit (N,), x_id (N,), y_id (N,)) where roi_bit is float32
    {0.,1.} and ids are int32 in [0, S-1].

    Semantics mirror reference `bop_dataset_pytorch.py:356-373`:
    out-of-roi if proj < bbox origin, or truncated pixel id >= S; ids clipped.
    """
    S = crop_size_gt
    # a degenerate bbox (dummy sample for a decode failure / missed
    # detection, data/dataset.py::dummy_item) must yield roi_bit=0 and id 0,
    # not NaN ids (0/0) whose int cast is platform-defined
    degenerate = (bbox[2] <= 0) | (bbox[3] <= 0)
    px_size = jnp.where(degenerate, 1.0, bbox[2].astype(jnp.float32) / S)
    py_size = jnp.where(degenerate, 1.0, bbox[3].astype(jnp.float32) / S)
    x_rel = (proj_xy[:, 0] - bbox[0]) / px_size
    y_rel = (proj_xy[:, 1] - bbox[1]) / py_size
    # numpy `.astype(int)` truncates toward zero; match it exactly.
    x_id = jnp.trunc(x_rel).astype(jnp.int32)
    y_id = jnp.trunc(y_rel).astype(jnp.int32)
    out1 = (proj_xy[:, 0] < bbox[0]) | (proj_xy[:, 1] < bbox[1])
    out2 = (x_id >= S) | (y_id >= S)
    roi_bit = jnp.logical_not(out1 | out2 | degenerate).astype(jnp.float32)
    x_id = jnp.clip(x_id, 0, S - 1)
    y_id = jnp.clip(y_id, 0, S - 1)
    return roi_bit, x_id, y_id


# ---------------------------------------------------------------------------
# farthest point sampling (host-side preprocessing)
# ---------------------------------------------------------------------------

def farthest_point_sample(xyz: np.ndarray, npoint: int, init_center: bool = True) -> np.ndarray:
    """FPS over mesh vertices; returns indices (npoint,).

    Mirrors `preprocess_data/get_fps_points.py:65-90`: seed with the vertex
    closest to the bbox center of the cloud, then greedy max-min.
    """
    n = xyz.shape[0]
    dists = np.full(n, np.inf)
    idx = np.zeros(npoint, dtype=np.int64)
    if init_center:
        center = 0.5 * (xyz.max(axis=0) + xyz.min(axis=0))
        first = int(np.argmin(((xyz - center) ** 2).sum(axis=1)))
    else:
        first = 0
    idx[0] = first
    last = xyz[first]
    for i in range(1, npoint):
        d = ((xyz - last) ** 2).sum(axis=1)
        dists = np.minimum(dists, d)
        nxt = int(np.argmax(dists))
        idx[i] = nxt
        last = xyz[nxt]
    return idx
