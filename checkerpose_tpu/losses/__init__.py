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
