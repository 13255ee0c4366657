"""Fused-inference wiring: swap every EdgeConv for the Pallas kernel.

Builds FusedEdgeConvParams (ops/pallas_edgeconv.py) from a trained variables
tree and registers them by module scope path; EdgeConv.__call__ picks them up
at inference (models/graph.py). Zero changes to the parameter tree.

    fwd = make_fused_pose_forward(net, knn_idx, stage=3)
    out = fwd(variables, batch)     # same signature as steps.make_pose_forward
"""
from __future__ import annotations

import contextlib
from typing import Dict

import jax
import numpy as np

from checkerpose_tpu.models.graph import _FUSED_REGISTRY
from checkerpose_tpu.ops.pallas_edgeconv import FusedEdgeConvParams


def build_fused_registry(variables, knn_idx: np.ndarray, *,
                         init_slope: float = 0.2, refine_slope: float = 0.2,
                         tile_n: int = 128, dtype=None,
                         interpret: bool = None) -> Dict[tuple, FusedEdgeConvParams]:
    """Walk params/batch_stats for EdgeConv leaves (a `conv` Dense kernel of
    shape (2C, C') next to a `bn`) and build fused params for each."""
    import jax.numpy as jnp
    dtype = dtype if dtype is not None else jnp.bfloat16
    if interpret is None:
        interpret = jax.default_backend() != "tpu"  # pallas TPU kernels interpret elsewhere
    params = variables["params"]
    stats = variables["batch_stats"]
    reg: Dict[tuple, FusedEdgeConvParams] = {}

    def walk(p, s, path):
        if not isinstance(p, dict):
            return
        if "conv" in p and isinstance(p["conv"], dict) and "kernel" in p["conv"] \
                and "bn" in p and s is not None and "bn" in s:
            k = np.asarray(p["conv"]["kernel"])
            # an EdgeConv Dense kernel maps concat[x_j - x_i, x_i] -> C', so
            # its input dim is exactly twice its output dim; anything else
            # (e.g. a future conv+bn pair that merely shares the names) must
            # NOT be swapped for the fused kernel
            if k.ndim == 2 and k.shape[0] == 2 * k.shape[1]:
                slope = init_slope if path and path[0] == "init_net" else refine_slope
                bnp = p["bn"]
                bns = s["bn"]
                reg[tuple(path)] = FusedEdgeConvParams(
                    knn_idx, k, bnp["scale"], bnp["bias"],
                    bns["mean"], bns["var"], tile_n=tile_n, slope=slope,
                    dtype=dtype, interpret=interpret)
                return
        for key, v in p.items():
            walk(v, s.get(key) if isinstance(s, dict) else None, path + [key])

    walk(params, stats, [])
    return reg


@contextlib.contextmanager
def fused_edgeconv(registry):
    token = _FUSED_REGISTRY.set(registry)
    try:
        yield
    finally:
        _FUSED_REGISTRY.reset(token)


def make_fused_pose_forward(net, knn_idx, stage: int, variables, **reg_kw):
    """Jitted inference forward with all EdgeConvs running the Pallas kernel.

    The registry is built once from `variables`; re-call after loading new
    weights. Same output contract as steps.make_pose_forward.
    """
    from checkerpose_tpu.train import steps

    registry = build_fused_registry(
        variables, np.asarray(knn_idx),
        init_slope=getattr(net, "init_graph_leaky_slope", 0.2),
        refine_slope=getattr(net, "graph_leaky_slope", 0.2), **reg_kw)
    with fused_edgeconv(registry):
        fwd = steps.make_pose_forward(net, knn_idx, stage)

        @jax.jit
        def fused_fwd(variables, batch):
            with fused_edgeconv(registry):
                return fwd(variables, batch)

    return fused_fwd
