"""Equivalence tests for the gated forward-path variants.

Both variants are DEFAULT-ON since the round-2 TPU measurement (+15% e2e for
the matmul upsample, neutral-to-positive for the fused gather; logs/perf);
env vars opt OUT:
  - CHECKERPOSE_BILINEAR_MATMUL=1: `upsample_bilinear_2x` as two constant
    matmuls instead of 4 spatial gathers (backward: matmuls, not scatters).
  - CHECKERPOSE_I2F_FUSED_GATHER=1: Index2Feat's 4 child reads as ONE gather.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from checkerpose_tpu.models.layers import (upsample_bilinear_2x,
                                           upsample_bilinear_2x_matmul)
from checkerpose_tpu.models.posenet import Index2Feat


@pytest.mark.parametrize("shape", [(2, 8, 8, 5), (1, 16, 12, 3)])
def test_bilinear_matmul_matches_gather(shape, monkeypatch):
    monkeypatch.setenv("CHECKERPOSE_BILINEAR_MATMUL", "0")  # gather reference
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    with jax.default_matmul_precision("float32"):
        a = jax.jit(upsample_bilinear_2x)(x)
        b = jax.jit(upsample_bilinear_2x_matmul)(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    assert a.shape == (shape[0], 2 * shape[1], 2 * shape[2], shape[3])


def test_bilinear_matmul_rows_sum_to_one():
    from checkerpose_tpu.models.layers import _bilinear_up2x_matrix
    for n in (4, 8, 16, 32):
        m = _bilinear_up2x_matrix(n)
        np.testing.assert_allclose(m.sum(axis=1), np.ones(2 * n), atol=1e-6)
        # endpoint rows are exact copies (align_corners=True)
        assert m[0, 0] == 1.0 and m[-1, -1] == 1.0


def test_index2feat_fused_gather_identical(monkeypatch):
    rng = np.random.default_rng(1)
    B, H, W, N = 2, 16, 16, 7
    img = jnp.asarray(rng.normal(size=(B, H, W, 8)).astype(np.float32))
    x_id = jnp.asarray(rng.integers(0, H // 2, (B, N)), jnp.int32)
    y_id = jnp.asarray(rng.integers(0, H // 2, (B, N)), jnp.int32)
    mod = Index2Feat(embed_dim=6, kernel_size=2, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(0), img, x_id, y_id)

    monkeypatch.setenv("CHECKERPOSE_I2F_FUSED_GATHER", "0")
    ref = mod.apply(params, img, x_id, y_id)
    monkeypatch.setenv("CHECKERPOSE_I2F_FUSED_GATHER", "1")
    fused = mod.apply(params, img, x_id, y_id)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(fused))
    assert fused.shape == (B, N, 4 * 6)
