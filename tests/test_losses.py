import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu import losses


def _np_bce_with_logits(x, y):
    # stable BCEWithLogits, the torch formula
    return np.maximum(x, 0) - x * y + np.log1p(np.exp(-np.abs(x)))


def test_unmasked_bce_matches_torch_formula():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 8, 3)).astype(np.float32)
    gt = rng.integers(0, 2, (2, 8, 3)).astype(np.float32)
    ours = float(losses.unmasked_code_loss(jnp.asarray(logits), jnp.asarray(gt)))
    ref = _np_bce_with_logits(logits, gt).mean()
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_masked_code_loss_normalization():
    """loss = sum(raw * mask) / (clamp(sum(mask),1) * num_bits), reference
    losses/code_loss.py:59-61."""
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((2, 8, 3)).astype(np.float32)
    gt = rng.integers(0, 2, (2, 8, 3)).astype(np.float32)
    mask = rng.integers(0, 2, (2, 8, 1)).astype(np.float32)
    ours = float(losses.masked_code_loss(jnp.asarray(logits), jnp.asarray(gt), jnp.asarray(mask)))
    raw = _np_bce_with_logits(logits, gt) * mask
    ref = raw.sum() / (max(mask.sum(), 1.0) * 3)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_masked_code_loss_empty_mask():
    logits = jnp.ones((2, 8, 3))
    gt = jnp.zeros((2, 8, 3))
    mask = jnp.zeros((2, 8, 1))
    out = float(losses.masked_code_loss(logits, gt, mask))
    assert out == 0.0  # clamp(0,1)=1 denominator, zero numerator


def test_mask_loss_interpolate():
    rng = np.random.default_rng(2)
    pred = jnp.asarray(rng.standard_normal((2, 8, 8)).astype(np.float32))
    gt = jnp.asarray((rng.random((2, 32, 32)) > 0.5).astype(np.float32))
    out = float(losses.mask_loss_interpolate(pred, gt))
    # manual: nearest-resize gt then L1
    g = np.asarray(gt)[:, ::4, ::4]
    ref = np.abs(jax.nn.sigmoid(pred) - g).mean()
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_per_bit_masked_code_loss_reduces_to_masked():
    """With no bit_masks/bit_weights the per-bit form is algebraically the
    reference MaskedCodeLoss (shared-mask normalizer factorizes over bits)."""
    rng = np.random.default_rng(7)
    logits = jnp.asarray(rng.standard_normal((3, 16, 5)).astype(np.float32))
    gt = jnp.asarray((rng.random((3, 16, 5)) > 0.5).astype(np.float32))
    mask = jnp.asarray((rng.random((3, 16, 1)) > 0.3).astype(np.float32))
    a = float(losses.masked_code_loss(logits, gt, mask))
    b = float(losses.per_bit_masked_code_loss(logits, gt, mask))
    np.testing.assert_allclose(a, b, rtol=1e-6)
    # L1 flavor too
    a = float(losses.masked_code_loss(logits, gt, mask, "L1"))
    b = float(losses.per_bit_masked_code_loss(logits, gt, mask, loss_type="L1"))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_per_bit_masked_code_loss_weights_and_masks():
    rng = np.random.default_rng(8)
    B, N, L = 2, 12, 4
    logits = jnp.asarray(rng.standard_normal((B, N, L)).astype(np.float32))
    gt = jnp.asarray((rng.random((B, N, L)) > 0.5).astype(np.float32))
    mask = jnp.ones((B, N, 1), jnp.float32)

    # per-bit reference values
    raw = np.asarray(jax.nn.sigmoid(logits))
    bce = -(np.asarray(gt) * np.log(raw + 1e-30)
            + (1 - np.asarray(gt)) * np.log(1 - raw + 1e-30))
    per_bit = bce.sum(axis=(0, 1)) / (B * N)

    # unnormalized boost on the last bit: amplifies only that term
    w = (1.0, 1.0, 1.0, 3.0)
    got = float(losses.per_bit_masked_code_loss(logits, gt, mask,
                                                bit_weights=w))
    want = (per_bit[0] + per_bit[1] + per_bit[2] + 3.0 * per_bit[3]) / L
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # bit_masks: zeroing one bit everywhere removes its contribution and the
    # remaining bits keep their own normalization
    bm = np.ones((B, N, L), np.float32)
    bm[..., 2] = 0.0
    got = float(losses.per_bit_masked_code_loss(logits, gt, mask,
                                                bit_masks=jnp.asarray(bm)))
    want = (per_bit[0] + per_bit[1] + 0.0 + per_bit[3]) / L
    np.testing.assert_allclose(got, want, rtol=1e-4)

    # partial per-keypoint mask on a bit: that bit normalizes by its own count
    bm = np.ones((B, N, L), np.float32)
    bm[:, : N // 2, 3] = 0.0
    got = float(losses.per_bit_masked_code_loss(logits, gt, mask,
                                                bit_masks=jnp.asarray(bm)))
    last = bce[:, N // 2:, 3].sum() / (B * (N - N // 2))
    want = (per_bit[0] + per_bit[1] + per_bit[2] + last) / L
    np.testing.assert_allclose(got, want, rtol=1e-4)
