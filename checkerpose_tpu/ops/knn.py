"""Static KNN graph construction over the 3D keypoints.

The reference computes a fixed KNN index once at model build time
(`checkerpose/model/init.py:27-32`) and reuses it in every EdgeConv. We do the
same: the index is a static (N, K) int array baked into the model config, so
every gather inside jit has a fixed shape -- ideal for XLA.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def knn_index(points, k: int) -> np.ndarray:
    """K nearest neighbors by (negative) squared euclidean distance.

    points: (N, 3) (or (N, C)). Returns int32 (N, K).

    Tie-breaking matters for parity: torch.topk on the reference's
    `-||xi-xj||^2` matrix returns indices of the k largest values; with exact
    ties (e.g. the self-distance 0 vs a duplicate point) torch picks the
    lower index first. np.argsort(kind="stable") reproduces that.
    """
    pts = np.asarray(points, dtype=np.float64)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)  # (N, N)
    idx = np.argsort(d2, axis=-1, kind="stable")[:, :k]
    return idx.astype(np.int32)


def gather_graph_feature(x: jnp.ndarray, knn_idx: jnp.ndarray) -> jnp.ndarray:
    """EdgeConv feature tensor: concat([x_j - x_i, x_i]) over neighbors.

    Args:
      x: (B, N, C) keypoint features (channel-last; the reference uses
         (B, C, N), see `model/init.py:36-49` -- channel-last is the
         TPU-friendly layout since the following 1x1 conv becomes a plain
         matmul on the MXU).
      knn_idx: static (N, K) int32.

    Returns (B, N, K, 2C).
    """
    xj = x[:, knn_idx]                       # (B, N, K, C) gather
    xi = x[:, :, None, :]                    # (B, N, 1, C)
    xi = jnp.broadcast_to(xi, xj.shape)
    return jnp.concatenate([xj - xi, xi], axis=-1)
