"""Device mesh + sharding helpers.

The reference is single-process single-GPU (SURVEY.md §2.3: no DP/TP/PP/
collectives anywhere); parallelism here is designed, not ported:

  * a 2-axis `(data, model)` jax.sharding.Mesh -- batch dim sharded over
    `data`; `model` is plumbed for future tensor parallelism but sized 1 at
    this model scale (~28M params fit trivially per chip).
  * training steps are written in GLOBAL view under jit: inputs carry
    NamedShardings, XLA inserts all-reduces over ICI for gradients and
    BatchNorm statistics automatically (sync-BN by construction).
  * multi-host: each host feeds its local shard via
    jax.make_array_from_process_local_data; same code path.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    """Mesh with axes ("data", "model"). Defaults to all devices on `data`."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = devices.size // n_model
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard leading (batch) dim over `data`, replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host-numpy batch dict on the mesh, batch-dim sharded.

    Scalar entries (e.g. n_real) are replicated.
    """
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = jax.device_put(v, data_sharding(mesh, v.ndim))
    return out


def replicate_tree(tree, mesh: Mesh):
    """Fully replicate a pytree (params/opt state) across the mesh."""
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def shard_manifest(samples, process_index: Optional[int] = None,
                   process_count: Optional[int] = None):
    """Per-host manifest shard for multi-host input pipelines: host i reads
    samples[i::n]. Pair with make_global_batch to form global arrays."""
    import jax
    pi = process_index if process_index is not None else jax.process_index()
    pc = process_count if process_count is not None else jax.process_count()
    return samples[pi::pc]


def make_global_batch(batch: dict, mesh: Mesh) -> dict:
    """Assemble a globally-sharded batch from per-process local data.

    Always goes through jax.make_array_from_process_local_data so the
    single-process path exercises the exact multi-host code (on one process
    the local data IS the global batch; scalars are replicated)."""
    import jax
    out = {}
    for k, v in batch.items():
        v = np.asarray(v)
        if v.ndim == 0:
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = jax.make_array_from_process_local_data(
                data_sharding(mesh, v.ndim), v)
    return out
