"""End-to-end crop->pose inference benchmark on the flagship model.

Measures crops/sec/chip through the FULL serving path on device: uint8 crop ->
normalize -> HRNet-w18 PoseNet (512 keypoints, 3 refinement stages, bf16) ->
binary-code decode -> batched RANSAC-EPnP pose solve. This is the pipeline the
reference runs as: GPU forward at batch 1 + per-image OpenCV EPnP on CPU
(`test.py:198,279-368`).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline note: the reference repo publishes no throughput numbers
(BASELINE.md). REF_CROPS_PER_SEC below is a generous estimate of the
reference's test-time throughput on its 2021-era single GPU: batch-1
HRNet-w18(256x256) forward ~20ms + CPU RANSAC-EPnP ~5ms => ~40 crops/s.
vs_baseline = value / REF_CROPS_PER_SEC.
"""
from __future__ import annotations

import json
import time

import numpy as np

REF_CROPS_PER_SEC = 40.0
BATCH = 512
NPOINT = 512


def _seed_compile_cache(cache_dir):
    """Seed the persistent XLA cache from the in-repo snapshot of this
    bench's compiled TPU programs (tools/tpu_cache_seed/). /root/.cache does
    not survive a VM restore while the repo does; without the seed a
    post-restore driver bench cold-compiles the b512 fused pipeline (~10+
    min on this 1-core host). Same mechanism as __graft_entry__'s CPU-side
    dryrun seed — cache keys depend on program + jax version + backend, not
    host machine, so the snapshot stays valid across restores."""
    import os
    import shutil

    seed_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "tools", "tpu_cache_seed")
    if not os.path.isdir(seed_dir):
        return
    os.makedirs(cache_dir, exist_ok=True)
    for name in os.listdir(seed_dir):
        if not name.endswith("-cache"):
            continue
        dst = os.path.join(cache_dir, name)
        if not os.path.exists(dst):
            try:
                shutil.copyfile(os.path.join(seed_dir, name), dst)
            except OSError:
                pass  # seeding is an optimization only


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _seed_compile_cache("/root/.cache/jax_comp_cache")

    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.ops.knn import knn_index
    from checkerpose_tpu.ops.geometry import pc_normalize
    from checkerpose_tpu.ops import crop
    from checkerpose_tpu.eval.decode import ids_to_correspondences
    from checkerpose_tpu.solver.ransac import solve_poses_batched

    rng = np.random.default_rng(0)
    p3d = rng.uniform(-40, 40, (NPOINT, 3)).astype(np.float32)
    p3dn = pc_normalize(p3d).astype(np.float32)
    knn = knn_index(p3dn, 20)
    net = PoseNet(npoint=NPOINT, res_log2=6, backbone_name="hrnet_w18",
                  num_graph_module=3, init_num_graph_module=2, local_k=2)

    img0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(
        net.init, static_argnames=("stage", "train"),
    )(jax.random.PRNGKey(0), img0, knn, jnp.asarray(p3dn)[None], stage=3, train=False)

    K = jnp.asarray(np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                             np.float32))

    # The pipeline runs as TWO dispatches: (1) network forward + decode,
    # (2) batched RANSAC-EPnP -- same structure as the eval harness and
    # ServingPipeline. (Measured equal to a single fused program: 192ms vs
    # 198ms at batch 64 with honest host-synced timing.)
    # EdgeConv path: CHECKERPOSE_FUSED_EDGECONV=1 swaps in the fused Pallas
    # kernel (ops/pallas_edgeconv.py, parity-tested; round-1: 1.35x over the
    # then per-edge XLA path). Default is now the XLA split-matmul EdgeConv
    # (models/graph.py): its per-NODE matmuls cost ~40x fewer FLOPs than the
    # kernel's one-hot-gather matmul (whichever measures faster at round end
    # stays the default).
    import contextlib
    import os
    # default ON: measured 843 -> 900 crops/s e2e on top of the matmul
    # upsample + fused gather (logs/perf/summary.log); =0 for XLA EdgeConv
    if os.environ.get("CHECKERPOSE_FUSED_EDGECONV", "1") == "1":
        from checkerpose_tpu.models.fused import build_fused_registry, fused_edgeconv
        registry = build_fused_registry(variables, knn)
        edgeconv_ctx = lambda: fused_edgeconv(registry)  # noqa: E731
    else:
        edgeconv_ctx = contextlib.nullcontext

    @jax.jit
    def stage1(variables, images_u8, bbox, p3d_normed):
        imgs = crop.normalize_image(images_u8.astype(jnp.float32))
        with edgeconv_ctx():
            out = net.apply(variables, imgs, knn, p3d_normed, stage=3, train=False)
        roi = (out["roi_logit"][..., 0] > 0.0).astype(jnp.float32)
        p2d, valid = ids_to_correspondences(
            out["x_id"], out["y_id"], roi, bbox, crop_size_gt=64,
            seg_mask=jax.nn.sigmoid(out["seg_logits"][..., 0]), check_seg=True)
        return p2d, valid

    # solver runs the low-latency FAST_PROFILE (64 hyp, no re-seed, 5 GN
    # iters) -- full ADD(-S)@0.1d recovery at reference-level 2% bit noise,
    # tests/test_oracle_noise.py::test_decode_solve_fast_profile_at_reference_noise
    from checkerpose_tpu.solver.ransac import FAST_PROFILE

    def fn(variables, images_u8, bbox, p3d_kp, p3d_normed, key):
        p2d, valid = stage1(variables, images_u8, bbox, p3d_normed)
        sol = solve_poses_batched(p3d_kp, p2d, valid, K, key, **FAST_PROFILE)
        return sol["R"], sol["t"], sol["num_inliers"]
    images = jnp.asarray(rng.integers(0, 255, (BATCH, 256, 256, 3)), jnp.uint8)
    bbox = jnp.tile(jnp.asarray([50., 60., 130., 130.]), (BATCH, 1))
    p3dj = jnp.asarray(p3d)
    p3dnj = jnp.tile(jnp.asarray(p3dn)[None], (BATCH, 1, 1))
    key = jax.random.PRNGKey(0)

    # warmup / compile
    R, t, ni = fn(variables, images, bbox, p3dj, p3dnj, key)
    R.block_until_ready()

    # NOTE: on this tunneled-TPU setup block_until_ready returns before the
    # computation finishes (verified: a known-FLOP matmul chain "measured"
    # 100x above hardware peak). The only reliable sync is materializing a
    # result-derived scalar on the host, so each iteration fetches one.
    n_iters = 20
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n_iters))
    float(jnp.sum(ni))  # sync warmup
    # depth-D software pipeline: batch i+D-1 is dispatched before batch i's
    # result scalar is materialized, hiding the host/tunnel round trip while
    # still forcing EVERY batch's full computation inside the timed window.
    # BENCH_DEPTH env overrides for A/B (deeper hides more tunnel latency at
    # the cost of more in-flight batches; 2 is the proven round-2 setting)
    depth = int(os.environ.get("BENCH_DEPTH", "2"))
    t0 = time.perf_counter()
    pending = []
    for i in range(n_iters):
        R, t, ni = fn(variables, images, bbox, p3dj, p3dnj, keys[i])
        pending.append(ni)
        if len(pending) >= depth:
            float(jnp.sum(pending.pop(0)))  # host-sync of the oldest batch
    while pending:
        float(jnp.sum(pending.pop(0)))
    dt = time.perf_counter() - t0
    crops_per_sec = BATCH * n_iters / dt

    print(json.dumps({
        "metric": "crop_to_pose_throughput",
        "value": round(crops_per_sec, 2),
        "unit": "crops/sec/chip",
        "vs_baseline": round(crops_per_sec / REF_CROPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
