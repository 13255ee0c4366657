"""Fused Pallas EdgeConv vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.ops.pallas_edgeconv import (FusedEdgeConvParams,
                                                 edgeconv_reference)
from checkerpose_tpu.ops.knn import knn_index


def test_fused_matches_reference():
    rng = np.random.default_rng(0)
    B, N, C, Cp, K = 2, 128, 64, 64, 10
    p3d = rng.standard_normal((N, 3)).astype(np.float32)
    knn = knn_index(p3d, K)
    x = rng.standard_normal((B, N, C)).astype(np.float32)
    kernel = (rng.standard_normal((2 * C, Cp)) * 0.1).astype(np.float32)
    g = rng.standard_normal(Cp).astype(np.float32)
    b = rng.standard_normal(Cp).astype(np.float32)
    m = rng.standard_normal(Cp).astype(np.float32) * 0.1
    v = np.abs(rng.standard_normal(Cp)).astype(np.float32) + 0.5

    ref = np.asarray(edgeconv_reference(jnp.asarray(x), knn, jnp.asarray(kernel),
                                        jnp.asarray(g), jnp.asarray(b),
                                        jnp.asarray(m), jnp.asarray(v)))
    fused = FusedEdgeConvParams(knn, kernel, g, b, m, v, tile_n=64,
                                dtype=jnp.float32)
    out = np.asarray(fused(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_selection_matrices():
    from checkerpose_tpu.ops.pallas_edgeconv import _selection_matrices
    knn = np.array([[1, 2], [0, 3], [3, 0], [2, 1]], np.int32)
    S = np.asarray(_selection_matrices(knn, tile_n=2, dtype=jnp.float32))
    assert S.shape == (2, 4, 4)
    x = np.arange(8.0).reshape(4, 2)
    got = S[0] @ x
    np.testing.assert_array_equal(got, x[[1, 2, 0, 3]])
