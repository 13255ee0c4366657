"""Graph modules: EdgeConv over a static keypoint KNN graph.

TPU-first design of the reference's `StaticGraph_module`
(`model/init.py:54-68`): features live channel-last (B, N, C) so the 1x1 conv
over edge features is a plain Dense -> one MXU matmul over (B*N*K, 2C);
the neighbor gather is `x[:, knn_idx]` with a static (N, K) index, which XLA
lowers to a single fused gather (the reference's `batch_indices` machinery,
`model/init.py:99-102`, disappears entirely).
"""
from __future__ import annotations

import contextvars
import os
from typing import Any, Dict

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

# Fused-kernel registry: maps an EdgeConv's scope path ("init_net","graph_0")
# to a FusedEdgeConvParams callable (ops/pallas_edgeconv.py). Set by
# models.fused.make_fused_variables; empty = always use the XLA path.
_FUSED_REGISTRY: contextvars.ContextVar[Dict[tuple, Any]] = contextvars.ContextVar(
    "edgeconv_fused_registry", default={})


_ONEHOT_GATHER = os.environ.get("CHECKERPOSE_ONEHOT_GATHER", "1") != "0"


def gather_neighbors(x: jnp.ndarray, knn_idx, onehot: bool = True) -> jnp.ndarray:
    """x (B, N, C); knn_idx static (N, K) or per-sample traced (B, N, K).

    Returns neighbor features (B, N, K, C).

    The per-sample (multi-object LM) form is computed as ONE-HOT MATMULS on
    the MXU rather than `take_along_axis`: TPU lowers a batched dynamic
    gather (and, worse, its scatter-add transpose in the backward pass) to
    serial HLO, which round-3 measured at ~6x the single-object train step
    (~2 s vs ~0.3 s, NOTES_ROUND3.md). Selection by a one-hot row is exact
    (each output element is one input value; zero terms vanish exactly at
    any matmul precision), and the gradient is the transposed matmul --
    both MXU-resident. Scanned over the K neighbor slots to bound the
    transient one-hot to (B, N, N) per chunk.

    ``onehot=False`` forces the `take_along_axis` path for this call site:
    round-4 measured the one-hot scan inside the INIT net's EdgeConvs
    blowing the cli.pretrain_lm first-step XLA compile past 50 min on this
    host (while the full refine net's identical gather compiled in ~2.5
    min) — the init net's K-gather is tiny, so it keeps take_along_axis and
    the one-hot win is reserved for the refine GNN (NOTES_ROUND4.md,
    session 9). Env CHECKERPOSE_ONEHOT_GATHER=0 globally opts out; the env
    var is read ONCE at module import (`_ONEHOT_GATHER`) — setting it after
    `checkerpose_tpu.models.graph` is imported has no effect (use the
    per-module `onehot_gather` field for runtime control).
    """
    if isinstance(knn_idx, (np.ndarray,)) or (hasattr(knn_idx, "ndim") and knn_idx.ndim == 2):
        return x[:, knn_idx]
    if _ONEHOT_GATHER and onehot:
        import jax
        N = x.shape[1]
        iota = jnp.arange(N, dtype=knn_idx.dtype)

        def body(_, idx_k):                       # idx_k (B, N)
            oh = (idx_k[..., None] == iota).astype(x.dtype)     # (B, N, N)
            return None, jnp.einsum("bnm,bmc->bnc", oh, x)

        _, g = jax.lax.scan(body, None, jnp.moveaxis(knn_idx, 2, 0))
        return jnp.moveaxis(g, 0, 2)              # (B, N, K, C)
    # per-sample index: batched gather
    idx = knn_idx[..., None]                      # (B, N, K, 1)
    return jnp.take_along_axis(x[:, :, None, :], idx, axis=1)


class _EdgeKernel(nn.Module):
    """Holds the EdgeConv Dense kernel at the same tree path a
    `nn.Dense(name="conv")` would ("conv"/"kernel", same init/dtype), so
    checkpoints and the timm converter are unaffected by the split-matmul
    formulation below."""
    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.lecun_normal(), self.shape)


class EdgeConv(nn.Module):
    """concat([x_j - x_i, x_i]) -> Dense (no bias) -> BN -> LeakyReLU -> max_K.

    Exact compute graph of the reference StaticGraph_module
    (`model/init.py:54-68`), channel-last — computed in the algebraically
    equivalent per-NODE form: with W = [W1; W2] splitting the Dense kernel,

        [x_j - x_i ; x_i] @ W  =  (x @ W1)_j  +  (x @ (W2 - W1))_i

    so the matmuls run once per node (2·N·C·C' MACs) instead of once per
    edge (N·K·2C·C' MACs — a 10x FLOP cut at K=20), and the per-edge work
    collapses to a static gather + add + BN + LeakyReLU + max that XLA fuses
    into one loop over the (B, N, K, C') logical tensor.
    """
    features: int
    leaky_slope: float = 0.2
    dtype: Any = jnp.bfloat16
    # Per-module opt-in to the one-hot per-sample gather (see
    # gather_neighbors). DEFAULT FLIPPED to False in round 5: the amortized
    # (single-sync, 20-step chained) A/B at batch 64 measured take_along at
    # 384/385 ms/step vs the one-hot scan at 491/497 ms — the one-hot "win"
    # recorded at the wall in round 4b (559 vs 772 ms) was tunnel-dispatch
    # noise, and chip-level the scan is 28% SLOWER on the current program
    # (BENCH.md round-5 A/B). The two paths are value-exact-identical
    # (tests/test_lm_multiobj.py), so this is purely a perf default.
    onehot_gather: bool = False

    @nn.compact
    def __call__(self, x, knn_idx, train: bool):
        if not train:
            reg = _FUSED_REGISTRY.get()
            # fused params bake in a single STATIC (N, K) graph; a per-sample
            # (B, N, K) knn_idx (LM multi-object, train/steps.knn_for_batch)
            # must take the XLA path -- silently using the registry's graph
            # would compute wrong neighbors
            if reg and getattr(knn_idx, "ndim", 2) == 2:
                try:
                    path = tuple(self.scope.path)
                except Exception:
                    path = None
                fused = reg.get(path)
                if fused is not None:
                    # params stay in `variables`; flax apply does not require
                    # every param to be consumed
                    return fused(x).astype(x.dtype)
        C = x.shape[-1]
        kernel = _EdgeKernel((2 * C, self.features), name="conv")()
        w1 = kernel[:C].astype(self.dtype)
        wd = (kernel[C:] - kernel[:C]).astype(self.dtype)  # W2 - W1 (f32 diff)
        xd = x.astype(self.dtype)
        y = xd @ w1                                             # (B, N, C')
        z = xd @ wd
        e = gather_neighbors(y, knn_idx, onehot=self.onehot_gather) \
            + z[:, :, None, :]                                  # (B, N, K, C')
        e = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         dtype=jnp.float32, name="bn")(e)
        e = nn.leaky_relu(e.astype(self.dtype), negative_slope=self.leaky_slope)
        return jnp.max(e, axis=2)                               # (B, N, C')
