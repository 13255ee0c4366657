"""Network output -> 2D-3D correspondences (batched, on device).

The reference's `from_id_to_pose` preamble (`test_network_with_test_data.py:
32-66`): predicted integer pixel ids map back to original-image coordinates
through the (square) crop bbox; validity = in-RoI bit, optionally AND the
predicted segmentation at that pixel, optionally AND a boundary-margin
discard. The pose solve itself is solver.ransac.solve_poses_batched.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def soft_ids(x_logits, y_logits):
    """Confidence-weighted expected cell ids from per-bit logits (MSB-first).

    E[id] = sum_i sigmoid(logit_i) * 2^(L-1-i): equal to the hard id when
    every bit is confident, and the center of the finest CONFIDENT block when
    trailing bits are uncertain (sigmoid ~ 0.5 contributes the half-cell
    offset). This is the L2-optimal decode under per-bit independence and
    removes the systematic sub-cell bias hard-thresholding introduces while
    fine bits are still unlearned. No reference analog (the reference always
    hard-decodes, CNN_output_to_pose.py); opt-in via decode_mode="soft".
    """
    L = x_logits.shape[-1]
    w = jnp.asarray(2.0 ** jnp.arange(L - 1, -1, -1), jnp.float32)
    ex = jnp.sum(jax.nn.sigmoid(x_logits.astype(jnp.float32)) * w, axis=-1)
    ey = jnp.sum(jax.nn.sigmoid(y_logits.astype(jnp.float32)) * w, axis=-1)
    return ex, ey


def adaptive_ids(x_logits, y_logits, tau: float = 3.0):
    """Confidence-truncated decode: trust a bit only when |logit| > tau,
    otherwise contribute the block-center 0.5.

    The progressive net's unlearned fine bits are near-chance but
    hard-threshold to a random corner of the finest CONFIDENT block, adding
    up to a full block of correspondence error; centering uncertain bits is
    the minimax position. Unlike `soft_ids` this keeps confident bits EXACT
    (no shrinkage), which measured ~5x better ADD@0.1d mid-training on the
    synthetic proof (tools/diag_finebits.py). No reference analog; opt-in
    via decode_mode="adaptive" + decode_conf_tau.
    """
    L = x_logits.shape[-1]
    w = jnp.asarray(2.0 ** jnp.arange(L - 1, -1, -1), jnp.float32)
    xl = x_logits.astype(jnp.float32)
    yl = y_logits.astype(jnp.float32)
    ex = jnp.sum(jnp.where(jnp.abs(xl) > tau, (xl > 0).astype(jnp.float32), 0.5) * w, axis=-1)
    ey = jnp.sum(jnp.where(jnp.abs(yl) > tau, (yl > 0).astype(jnp.float32), 0.5) * w, axis=-1)
    return ex, ey


@functools.partial(jax.jit, static_argnames=("crop_size_gt", "check_seg",
                                             "discard_bd_pixel"))
def ids_to_correspondences(x_id, y_id, roi_mask, bbox, *, crop_size_gt: int,
                           seg_mask=None, check_seg: bool = False,
                           discard_bd_pixel: int = 0,
                           filter_x_id=None, filter_y_id=None):
    """Args (batched):
      x_id/y_id: (B, N) int32 at crop_size_gt resolution (float allowed
        under soft/adaptive decode; p2d is ids*scale either way).
      roi_mask: (B, N) float {0,1} predicted in-RoI bit.
      bbox: (B, 4) final square bbox [x, y, w, h].
      seg_mask: (B, h, w) predicted seg probabilities (resolution h=w may be
        crop_size_gt or coarser; looked up at the id grid, like the
        stage-aware lookup at `test_network_with_test_data.py:383-402`).
      filter_x_id/filter_y_id: optional ids for the seg/boundary validity
        checks when they should differ from the coordinate ids. Soft/adaptive
        decodes center uncertain keypoints mid-block, which can land OFF the
        segmentation even when the net's finest-cell claim is on it -- the
        filter must judge the net's hard claim, not the centered coordinate
        (measured: the visib filter drops so many centered points that
        ADD@0.1d collapses 0.41 -> 0.03 without this split).

    Returns (p2d (B, N, 2) original-image pixels, valid (B, N) float).
    """
    S = crop_size_gt
    scale = bbox[:, None, 2:4] / S                     # (B, 1, 2)
    ids = jnp.stack([x_id, y_id], axis=-1).astype(jnp.float32)  # (B, N, 2)
    p2d = ids * scale + bbox[:, None, 0:2]

    fx = x_id if filter_x_id is None else filter_x_id
    fy = y_id if filter_y_id is None else filter_y_id
    valid = roi_mask
    if check_seg and seg_mask is not None:
        h = seg_mask.shape[1]
        f = h // S if h >= S else 1
        # seg may be coarser than S when refinement is incomplete; ids may be
        # float under decode_mode="soft" -- the lookup grid stays integer
        xi = jnp.floor(fx).astype(jnp.int32)
        yi = jnp.floor(fy).astype(jnp.int32)
        sx = jnp.clip((xi * h) // S, 0, h - 1)
        sy = jnp.clip((yi * h) // S, 0, h - 1)
        flat = seg_mask.reshape(seg_mask.shape[0], -1)
        seg_at = jnp.take_along_axis(flat, sy * h + sx, axis=1)
        valid = valid * (seg_at > 0.5).astype(jnp.float32)
    if discard_bd_pixel > 0:
        inb = ((fx >= discard_bd_pixel) & (fx < S - discard_bd_pixel) &
               (fy >= discard_bd_pixel) & (fy < S - discard_bd_pixel))
        valid = valid * inb.astype(jnp.float32)
    return p2d, valid
