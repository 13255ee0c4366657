"""Shared NN building blocks (NHWC, bf16 compute / f32 params+stats).

BatchNorm note: the whole framework runs in *global view* under jit with
sharded inputs, so batch statistics are computed over the full global batch
and XLA inserts the cross-replica reductions -- BN is "sync BN" by
construction, resolving the reference's BN-under-data-parallelism question
(SURVEY §7 hard part 4) for free.
"""
from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp
import flax.linen as nn

Dtype = Any


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> activation. kernel int or (kh, kw)."""
    features: int
    kernel: int = 3
    stride: int = 1
    act: Callable | None = nn.relu
    use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel if isinstance(self.kernel, (tuple, list)) else (self.kernel, self.kernel)
        x = nn.Conv(self.features, k, strides=(self.stride, self.stride),
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(x)
        x = x.astype(self.dtype)
        if self.act is not None:
            x = self.act(x)
        return x


class BasicBlock(nn.Module):
    """ResNet-v1 basic block (two 3x3 convs), as used by ResNet-34 and HRNet
    branches."""
    features: int
    stride: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = ConvBNAct(self.features, 3, self.stride, nn.relu, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(self.features, 3, 1, None, dtype=self.dtype, name="conv2")(y, train)
        if residual.shape != y.shape:
            residual = ConvBNAct(self.features, 1, self.stride, None, dtype=self.dtype,
                                 name="downsample")(x, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """ResNet bottleneck (1x1 -> 3x3 -> 1x1, expansion 4)."""
    features: int
    stride: int = 1
    expansion: int = 4
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        out_feats = self.features * self.expansion
        y = ConvBNAct(self.features, 1, 1, nn.relu, dtype=self.dtype, name="conv1")(x, train)
        y = ConvBNAct(self.features, 3, self.stride, nn.relu, dtype=self.dtype, name="conv2")(y, train)
        y = ConvBNAct(out_feats, 1, 1, None, dtype=self.dtype, name="conv3")(y, train)
        if residual.shape != y.shape:
            residual = ConvBNAct(out_feats, 1, self.stride, None, dtype=self.dtype,
                                 name="downsample")(x, train)
        return nn.relu(y + residual)


def _bilinear_up2x_matrix(n: int):
    """(2n, n) interpolation matrix for align_corners=True 2x bilinear
    upsampling along one axis: out[i] samples input at i*(n-1)/(2n-1), so each
    row holds the two lerp weights. Cached per size (sizes are static)."""
    import numpy as np
    m = _BILINEAR_MATRIX_CACHE.get(n)
    if m is None:
        g = np.arange(2 * n, dtype=np.float64) * (n - 1) / (2 * n - 1)
        i0 = np.floor(g).astype(np.int64)
        i1 = np.minimum(i0 + 1, n - 1)
        w = (g - i0).astype(np.float64)
        m = np.zeros((2 * n, n), np.float32)
        np.add.at(m, (np.arange(2 * n), i0), (1.0 - w).astype(np.float32))
        np.add.at(m, (np.arange(2 * n), i1), w.astype(np.float32))
        _BILINEAR_MATRIX_CACHE[n] = m
    return m


_BILINEAR_MATRIX_CACHE: dict = {}


def upsample_bilinear_2x_matmul(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling as two small constant matmuls.

    Same math as `upsample_bilinear_2x` (align_corners=True), but expressed as
    (2H,H)@x along H then (2W,W)@x along W: the forward becomes MXU work
    instead of 4 spatial gathers, and the backward becomes the transposed
    matmuls instead of 4 scatter-adds (scatters serialize badly on TPU)."""
    B, H, W, C = x.shape
    my = jnp.asarray(_bilinear_up2x_matrix(H), x.dtype)
    mx = jnp.asarray(_bilinear_up2x_matrix(W), x.dtype)
    y = jnp.einsum("ph,bhwc->bpwc", my, x)
    return jnp.einsum("qw,bpwc->bpqc", mx, y)


def upsample_bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsampling, align_corners=True to match
    nn.UpsamplingBilinear2d (reference `model/pipeline.py:201`).

    Default route is the matmul formulation (`upsample_bilinear_2x_matmul`,
    identical weights; bf16 rounding may differ by ~1 ulp): measured +15%
    END-TO-END crop->pose throughput at batch 512 on the v5e (724 -> 831
    crops/s, logs/perf) because the backward becomes two transposed matmuls
    instead of 4 scatter-adds. Set CHECKERPOSE_BILINEAR_MATMUL=0 for the
    gather formulation."""
    import os
    if os.environ.get("CHECKERPOSE_BILINEAR_MATMUL", "1") == "1":
        return upsample_bilinear_2x_matmul(x)
    B, H, W, C = x.shape
    # align_corners=True: out[i] samples input at i*(H-1)/(2H-1)
    def grid(n):
        return jnp.arange(2 * n, dtype=jnp.float32) * (n - 1) / (2 * n - 1)
    gy, gx = grid(H), grid(W)
    y0 = jnp.floor(gy).astype(jnp.int32)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (gy - y0)[None, :, None, None].astype(x.dtype)
    wx = (gx - x0)[None, None, :, None].astype(x.dtype)
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx
