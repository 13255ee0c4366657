"""2-process jax.distributed CPU probe/worker (VERDICT r2 #6).

Run as: python tools/multihost_probe.py <process_id> <num_processes> <port>
Each process owns 4 virtual CPU devices -> an 8-device global mesh. Drives
shard_manifest + make_global_batch + one gradient step whose loss/grads are
global (XLA inserts the cross-process collectives), then prints a line the
parent asserts on.
"""
import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
# drop any inherited device-count force (e.g. the test conftest's =8) so the
# per-process count is exactly 4 regardless of parent environment
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"])
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from checkerpose_tpu.parallel.mesh import (  # noqa: E402
    make_global_batch, make_mesh, replicate_tree, shard_manifest)

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

mesh = make_mesh()  # all 8 global devices on the data axis

# deterministic global dataset, each host loads only its manifest shard
manifest = list(range(16))
local_ids = shard_manifest(manifest)
assert len(local_ids) == len(manifest) // nproc
rng = np.random.default_rng(0)
X_all = rng.normal(size=(16, 8)).astype(np.float32)
Y_all = rng.normal(size=(16, 3)).astype(np.float32)
local = {"x": X_all[local_ids], "y": Y_all[local_ids],
         "n_real": np.asarray(16)}

gb = make_global_batch(local, mesh)
assert gb["x"].shape == (16, 8), gb["x"].shape  # GLOBAL batch dim
assert not gb["x"].is_fully_replicated

w = replicate_tree({"w": jnp.zeros((8, 3), jnp.float32)}, mesh)


@jax.jit
def train_step(w, batch):
    def loss_fn(w):
        pred = batch["x"] @ w["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    loss, g = jax.value_and_grad(loss_fn)(w)
    return jax.tree.map(lambda p, gg: p - 0.1 * gg, w, g), loss


w2, loss = train_step(w, gb)
# the loss is a GLOBAL mean: every process must see the identical value,
# equal to the single-host numpy computation over the full dataset
expect = float(np.mean((X_all @ np.zeros((8, 3), np.float32) - Y_all) ** 2))
got = float(loss)
assert abs(got - expect) < 1e-5, (got, expect)
w2_host = np.asarray(jax.device_get(w2["w"]))
print(f"MULTIHOST_OK pid={pid} loss={got:.6f} wsum={w2_host.sum():.6f}",
      flush=True)
