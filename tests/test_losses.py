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
