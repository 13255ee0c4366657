"""Pallas TPU kernel: fused EdgeConv (inference, BN folded).

The XLA EdgeConv (models/graph.py) materializes two large intermediates in
HBM: the edge tensor (B, N, K, 2C) and the pre-max activations (B, N, K, C').
This kernel keeps both in VMEM per (batch-row, keypoint-tile) block:

    y[b, n] = max_k leaky(scale * (concat(x_j - x_i, x_i) @ W) + bias)

Two TPU-native tricks:
  * the static KNN gather is expressed as a one-hot selection MATMUL
    S_tile (TN*K, N) @ x_b (N, C) -- dynamic row gathers are slow on the
    VPU, but this rides the MXU;
  * the concat-matmul splits algebraically:
        [x_j - x_i ; x_i] @ W = x_j @ W_top + x_i @ (W_bot - W_top)
    so no concatenated tensor is ever built.

BN folding (inference): scale = gamma / sqrt(var + eps),
bias = beta - mean * scale.

Entry points: `FusedEdgeConvParams` (precomputed per-layer constants,
callable), `edgeconv_fused_pallas` (raw kernel), `edgeconv_reference`
(pure-XLA same-math reference used by the parity tests). On non-TPU
backends the kernel runs in Pallas interpret mode (slow but correct) --
models/graph.EdgeConv's normal XLA path is the production fallback there.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _selection_matrices(knn_idx: np.ndarray, tile_n: int, dtype=jnp.bfloat16):
    """(n_tiles, TN*K, N) one-hot neighbor selectors, a static constant."""
    N, K = knn_idx.shape
    assert N % tile_n == 0, (N, tile_n)
    n_tiles = N // tile_n
    S = np.zeros((n_tiles, tile_n * K, N), np.float32)
    for t in range(n_tiles):
        for i in range(tile_n):
            for k in range(K):
                S[t, i * K + k, knn_idx[t * tile_n + i, k]] = 1.0
    return jnp.asarray(S, dtype)


def _kernel(x_ref, s_ref, w1_ref, w2m1_ref, scale_ref, bias_ref, o_ref,
            *, tile_n: int, k: int, slope: float):
    # blocks: x (1, N, C); s (1, TN*K, N); w* (C, Cp); scale/bias (1, Cp)
    j = pl.program_id(1)
    x = x_ref[0]                                            # (N, C)
    s = s_ref[0]                                            # (TN*K, N)
    xj = jnp.dot(s, x, preferred_element_type=jnp.float32)  # (TN*K, C)
    xi = x_ref[0, pl.ds(j * tile_n, tile_n), :].astype(jnp.float32)  # (TN, C)
    a = jnp.dot(xj, w1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)          # (TN*K, Cp)
    c = jnp.dot(xi, w2m1_ref[:].astype(jnp.float32),
                preferred_element_type=jnp.float32)          # (TN, Cp)
    Cp = a.shape[-1]
    y = a.reshape(tile_n, k, Cp) + c[:, None, :]
    y = y * scale_ref[0][None] + bias_ref[0][None]
    y = jnp.where(y >= 0, y, y * slope)
    o_ref[0] = jnp.max(y, axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_n", "slope", "interpret"))
def edgeconv_fused_pallas(x, sel, w1, w2m1, scale, bias, *, tile_n: int,
                          slope: float = 0.2, interpret: bool = False):
    """x (B, N, C); sel (n_tiles, TN*K, N); w1/w2m1 (C, Cp);
    scale/bias (Cp,). Returns (B, N, Cp)."""
    B, N, C = x.shape
    n_tiles, tnk, _ = sel.shape
    K = tnk // tile_n
    Cp = w1.shape[1]
    grid = (B, n_tiles)
    out = pl.pallas_call(
        functools.partial(_kernel, tile_n=tile_n, k=K, slope=slope),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, N, C), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, tnk, N), lambda b, j: (j, 0, 0)),
            pl.BlockSpec((C, Cp), lambda b, j: (0, 0)),
            pl.BlockSpec((C, Cp), lambda b, j: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, j: (0, 0)),
            pl.BlockSpec((1, Cp), lambda b, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, tile_n, Cp), lambda b, j: (b, j, 0)),
        out_shape=jax.ShapeDtypeStruct((B, N, Cp), x.dtype),
        interpret=interpret,
    )(x, sel, w1, w2m1, scale.reshape(1, Cp), bias.reshape(1, Cp))
    return out


class FusedEdgeConvParams:
    """Precomputed constants for one EdgeConv layer at inference."""

    def __init__(self, knn_idx: np.ndarray, kernel: np.ndarray,
                 bn_scale, bn_bias, bn_mean, bn_var, *, tile_n: int = 128,
                 eps: float = 1e-5, slope: float = 0.2, dtype=jnp.bfloat16,
                 interpret: bool = False):
        self.interpret = interpret
        N, K = knn_idx.shape
        # tile_n must divide N (grid tiling); fall back to the largest
        # divisor of N <= tile_n instead of asserting (npoint=192 etc.)
        tile_n = min(tile_n, N)
        while N % tile_n != 0:
            tile_n -= 1
        self.tile_n = tile_n
        self.slope = float(slope)
        self.sel = _selection_matrices(np.asarray(knn_idx), tile_n, dtype)
        w = np.asarray(kernel)                      # (2C, Cp) flax Dense kernel
        C = w.shape[0] // 2
        self.w1 = jnp.asarray(w[:C], dtype)         # acts on x_j - x_i -> x_j part
        self.w2m1 = jnp.asarray(w[C:] - w[:C], dtype)
        s = np.asarray(bn_scale) / np.sqrt(np.asarray(bn_var) + eps)
        self.scale = jnp.asarray(s, jnp.float32)
        self.bias = jnp.asarray(np.asarray(bn_bias) - np.asarray(bn_mean) * s,
                                jnp.float32)

    def __call__(self, x, interpret: bool = None):
        interpret = self.interpret if interpret is None else interpret
        return edgeconv_fused_pallas(x, self.sel, self.w1, self.w2m1,
                                     self.scale, self.bias, tile_n=self.tile_n,
                                     slope=self.slope, interpret=interpret)


def edgeconv_reference(x, knn_idx, kernel, bn_scale, bn_bias, bn_mean, bn_var,
                       eps: float = 1e-5, slope: float = 0.2):
    """Pure-XLA reference of the same folded-BN inference EdgeConv (matches
    models/graph.EdgeConv with use_running_average=True)."""
    xj = x[:, knn_idx]
    xi = jnp.broadcast_to(x[:, :, None, :], xj.shape)
    e = jnp.concatenate([xj - xi, xi], axis=-1)
    y = e @ kernel
    s = bn_scale / jnp.sqrt(bn_var + eps)
    y = y * s + (bn_bias - bn_mean * s)
    y = jnp.where(y >= 0, y, y * slope)
    return jnp.max(y, axis=2)
