"""ServingPipeline latency/throughput table (VERDICT r2 weak #1: no serving
latency numbers existed; the reference's deployment shape is per-image).

Measures, on the real TPU, for batch sizes 1/8/64 (+512 for the throughput
ceiling):
  * steady-state per-batch latency through `stream()` at depth 2 (the
    production double-buffered path), derived as wall/(n batches);
  * single-shot synchronous latency (one __call__ + host materialization)
    -- what a strictly per-request server would see.

Honest-timing rules for this tunneled setup (CLAUDE.md rule 3): every
measurement materializes a result-derived scalar on the host; no
block_until_ready.

Usage: python benchmarks/bench_serving.py  (prints a markdown table)

Env CHECKERPOSE_SERVING_BATCHES="1,64" restricts the batch sweep (short
quiet-chip windows); each row also prints incrementally as it completes so
a wall-guard kill cannot lose the measured rows (the r4 end-window sweep
lost entire legs to exactly that).
"""
from __future__ import annotations

import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    # re-seed the persistent cache from the in-repo TPU program snapshot —
    # /root/.cache does not survive a VM restore (CLAUDE.md rule 12)
    try:
        import sys
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from bench import _seed_compile_cache
        _seed_compile_cache("/root/.cache/jax_comp_cache")
    except Exception:
        pass  # seeding is an optimization only

    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.ops.knn import knn_index
    from checkerpose_tpu.ops.geometry import pc_normalize
    from checkerpose_tpu.serving import ServingPipeline

    rng = np.random.default_rng(0)
    npoint = 512
    p3d = rng.uniform(-40, 40, (npoint, 3)).astype(np.float32)
    p3dn = pc_normalize(p3d).astype(np.float32)
    knn = knn_index(p3dn, 20)
    net = PoseNet(npoint=npoint, res_log2=6, backbone_name="hrnet_w18",
                  num_graph_module=3, init_num_graph_module=2, local_k=2)
    variables = jax.jit(
        net.init, static_argnames=("stage", "train"),
    )(jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32), knn,
      jnp.asarray(p3dn)[None], stage=3, train=False)
    pipe = ServingPipeline(net, knn, variables, p3d, p3dn,
                           fused_edgeconv=True)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    key = jax.random.PRNGKey(0)

    batch_sizes = tuple(
        int(b) for b in
        os.environ.get("CHECKERPOSE_SERVING_BATCHES", "1,8,64,512").split(",")
        if b.strip().isdigit())
    rows = []
    for B in batch_sizes:
        images = rng.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8)
        bbox = np.tile(np.array([50, 60, 130, 130], np.float32), (B, 1))

        # warm both paths (compile)
        sol = pipe(images, bbox, K, key)
        float(np.asarray(sol["num_inliers"]).sum())

        # single-shot synchronous latency
        n = 10
        t0 = time.perf_counter()
        for i in range(n):
            sol = pipe(images, bbox, K, jax.random.fold_in(key, i))
            float(np.asarray(sol["num_inliers"]).sum())  # host sync
        sync_ms = (time.perf_counter() - t0) / n * 1e3

        # steady-state stream() at depth 2
        n = 20
        batches = ((images, bbox, K) for _ in range(n))
        t0 = time.perf_counter()
        got = 0
        for out in pipe.stream(batches, key, depth=2):
            float(out["num_inliers"].sum())
            got += 1
        dt = time.perf_counter() - t0
        assert got == n
        stream_ms = dt / n * 1e3
        rows.append((B, sync_ms, stream_ms, B * n / dt))
        print(f"row: batch {B}  sync {sync_ms:.1f} ms  stream {stream_ms:.1f} "
              f"ms/batch  {B * n / dt:.0f} crops/s", flush=True)

    print("\n| batch | sync latency ms | stream ms/batch | stream crops/s |")
    print("|---|---|---|---|")
    for B, sync_ms, stream_ms, cps in rows:
        print(f"| {B} | {sync_ms:.1f} | {stream_ms:.1f} | {cps:.0f} |")


if __name__ == "__main__":
    main()
