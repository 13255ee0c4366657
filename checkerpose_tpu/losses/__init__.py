"""Losses.

jnp re-expressions of the reference losses (`checkerpose/losses/code_loss.py`,
`losses/mask_loss.py`). Bit layout here is (B, N, num_bits) (bits last);
masks are (B, N, 1) and broadcast over bits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def _bce_with_logits(logits, labels):
    return optax.sigmoid_binary_cross_entropy(logits, labels)


def unmasked_code_loss(logits: jnp.ndarray, gt: jnp.ndarray, loss_type: str = "BCE") -> jnp.ndarray:
    """Mean BCE-with-logits (or L1 on sigmoid) over all bits.

    Reference `UnmaskedCodeLoss` (`losses/code_loss.py:6-26`).
    """
    if loss_type == "BCE":
        return jnp.mean(_bce_with_logits(logits, gt))
    if loss_type == "L1":
        return jnp.mean(jnp.abs(jax.nn.sigmoid(logits) - gt))
    raise ValueError(f"loss_type {loss_type} not supported")


def masked_code_loss(logits: jnp.ndarray, gt: jnp.ndarray, gt_mask: jnp.ndarray,
                     loss_type: str = "BCE") -> jnp.ndarray:
    """Per-element code loss masked by the in-RoI bit.

    logits/gt: (B, N, num_bits); gt_mask: (B, N, 1).
    normalizer = clamp(sum(mask), 1) * num_bits.
    Reference `MaskedCodeLoss` (`losses/code_loss.py:29-62`).
    """
    if loss_type == "BCE":
        raw = _bce_with_logits(logits, gt)
        num_bits = logits.shape[-1]
    elif loss_type == "L1":
        raw = jnp.abs(jax.nn.sigmoid(logits) - gt)
        num_bits = logits.shape[-1]
    elif loss_type == "CE":
        # multi-class over last axis; gt is integer ids (B, N)
        raw = optax.softmax_cross_entropy_with_integer_labels(logits, gt)[..., None]
        num_bits = 1
    else:
        raise ValueError(f"loss_type {loss_type} not supported")
    raw = raw * gt_mask
    denom = jnp.clip(jnp.sum(gt_mask), 1.0, None) * num_bits
    return jnp.sum(raw) / denom


def per_bit_masked_code_loss(logits: jnp.ndarray, gt: jnp.ndarray,
                             gt_mask: jnp.ndarray, bit_masks=None,
                             bit_weights=None,
                             loss_type: str = "BCE") -> jnp.ndarray:
    """Masked code loss with per-bit normalization, masks, and weights.

    logits/gt: (B, N, L); gt_mask: (B, N, 1); bit_masks: optional (B, N, L)
    extra multiplicative mask (e.g. prefix-correct supervision of refine
    bits); bit_weights: optional length-L vector of per-bit loss weights.

    Each bit's loss is normalized by ITS OWN supervised count
    (`sum(mask_j)` clamped to 1) and the per-bit losses are averaged with
    `bit_weights` (unnormalized: weights > 1 amplify that bit's gradient
    without shrinking the others'). With `bit_masks=None` and unit weights
    this is algebraically identical to `masked_code_loss` (the reference
    `MaskedCodeLoss`, `losses/code_loss.py:29-62`): the shared-roi-mask
    normalizer factorizes over bits.

    Why it exists (round-5): the finest refine bits sit at chance through
    multi-campaign training (ACCURACY.md). Under autonomous conditioning a
    wrong prefix cell makes the GT fine bit unlearnable from the gathered
    features — supervising it anyway labels noise. `bit_masks` lets the
    train step restrict fine-bit supervision to keypoints whose predicted
    conditioning cell is correct, and `bit_weights` lets the autonomous
    tail re-weight the fine bits (VERDICT r4 item 2).
    """
    if loss_type == "BCE":
        raw = _bce_with_logits(logits, gt)
    elif loss_type == "L1":
        raw = jnp.abs(jax.nn.sigmoid(logits) - gt)
    else:
        raise ValueError(f"loss_type {loss_type} not supported for per-bit loss")
    L = logits.shape[-1]
    m = jnp.broadcast_to(gt_mask, raw.shape)
    if bit_masks is not None:
        m = m * bit_masks
    per_bit = jnp.sum(raw * m, axis=(0, 1)) / jnp.clip(
        jnp.sum(m, axis=(0, 1)), 1.0, None)                     # (L,)
    if bit_weights is not None:
        w = jnp.asarray(bit_weights, jnp.float32)
        return jnp.sum(per_bit * w) / L
    return jnp.mean(per_bit)


def mask_loss_interpolate(seg_logit: jnp.ndarray, gt_mask: jnp.ndarray) -> jnp.ndarray:
    """L1 between sigmoid(pred mask) and nearest-resized GT mask.

    seg_logit: (B, h, w) one channel of the seg head output.
    gt_mask: (B, H, W) float {0., 1.} at full GT resolution.
    Reference `MaskLoss_interpolate` (`losses/mask_loss.py:6-17`).
    """
    B, h, w = seg_logit.shape
    H, W = gt_mask.shape[1], gt_mask.shape[2]
    # torch F.interpolate(mode="nearest") picks src index floor(i * H/h)
    # (jax.image.resize "nearest" samples cell centers instead -- different).
    yi = (jnp.arange(h) * (H / h)).astype(jnp.int32)
    xi = (jnp.arange(w) * (W / w)).astype(jnp.int32)
    resized = gt_mask[:, yi][:, :, xi]
    return jnp.mean(jnp.abs(jax.nn.sigmoid(seg_logit) - resized))
