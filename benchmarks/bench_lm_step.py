"""LM (multi-object) stacked-KNN train-step timing — the one-hot-gather A/B.

Round 3 measured the LM train step at ~6x the single-object step (~2 s vs
~0.3 s at batch 64) and attributed it to the per-sample dynamic (B, N, K)
neighbor gather (take_along_axis -> gather/scatter pairs in fwd/bwd).
models/graph.py:48-58 replaced it with one-hot matmuls scanned over K
(value-exact; backward is a transposed matmul). This benchmark produces the
committed before/after number (VERDICT r3 next-round #7):

    python benchmarks/bench_lm_step.py --batch 64            # one-hot (default)
    CHECKERPOSE_ONEHOT_GATHER=0 python benchmarks/bench_lm_step.py --batch 64

Host-synced per iteration (CLAUDE.md rule 3: block_until_ready lies through
the tunnel; materialize a result-derived scalar instead).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(batch=64, n_objects=4, reps=20):
    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.ops.knn import knn_index
    from checkerpose_tpu.ops.geometry import pc_normalize
    from checkerpose_tpu.train import steps
    from checkerpose_tpu.train.state import create_pose_state, make_optimizer

    rng = np.random.default_rng(0)
    p3dn_stack, knn_list = [], []
    for o in range(n_objects):
        p3d = rng.uniform(-40, 40, (512, 3)).astype(np.float32)
        p3dn = pc_normalize(p3d).astype(np.float32)
        p3dn_stack.append(p3dn)
        knn_list.append(knn_index(p3dn, 20))
    p3dn_stack = np.stack(p3dn_stack)           # (O, N, 3)
    knn_stack = np.stack(knn_list)               # (O, N, K) stacked KNN table

    net = PoseNet(npoint=512, res_log2=6, backbone_name="hrnet_w18",
                  num_graph_module=3, init_num_graph_module=2, local_k=2)
    opt = make_optimizer(1e-4)
    state = create_pose_state(net, knn_stack[0], 256, opt, 512)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    # stacked (O, N, K) knn -> per-sample gather by obj_idx inside the step
    step = steps.make_train_step(net, knn_stack, opt, stage=3)

    B = batch
    obj_idx = rng.integers(0, n_objects, B).astype(np.int32)
    batch_d = {
        "image": rng.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8),
        "proj_xy": np.stack([rng.uniform(60, 170, (B, 512)),
                             rng.uniform(70, 180, (B, 512))], -1).astype(np.float32),
        "bbox": np.tile(np.array([50, 60, 130, 130], np.float32), (B, 1)),
        "mask_visib": (rng.random((B, 64, 64)) > 0.5).astype(np.float32),
        "mask_full": (rng.random((B, 64, 64)) > 0.3).astype(np.float32),
        "p3d_normed": p3dn_stack[obj_idx],
        "obj_idx": obj_idx,
    }

    sd, m = step(sd, batch_d, jax.random.PRNGKey(0))     # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(reps):
        sd, m = step(sd, batch_d, jax.random.PRNGKey(i))
        float(m["loss"])                                  # host sync
    dt = (time.perf_counter() - t0) / reps
    print(f"LM train step batch {B} ({n_objects} objects): {dt * 1e3:.1f} ms  "
          f"({B / dt:.0f} im/s)  "
          f"onehot_gather={os.environ.get('CHECKERPOSE_ONEHOT_GATHER', '1')}",
          flush=True)

    # AMORTIZED chip-level estimate (VERDICT r4 weak #3): the per-iteration
    # host sync above pays ~0.4-0.5 s of tunnel dispatch per step, flooring
    # both A/B legs and hiding the chip-time ratio. Chaining K steps with
    # ONE final sync amortizes the dispatch floor to ~1/K; the chain is
    # data-dependent (state threads through), so the chip must execute all
    # K steps before the sync can return — this is a tunnel-honest
    # lower-variance estimate of on-chip step time.
    K = reps
    t0 = time.perf_counter()
    for i in range(K):
        sd, m = step(sd, batch_d, jax.random.PRNGKey(1000 + i))
    float(m["loss"])                                      # single sync
    dta = (time.perf_counter() - t0) / K
    print(f"LM train step batch {B} AMORTIZED x{K} (single sync): "
          f"{dta * 1e3:.1f} ms  ({B / dta:.0f} im/s)  "
          f"onehot_gather={os.environ.get('CHECKERPOSE_ONEHOT_GATHER', '1')}",
          flush=True)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--objects", type=int, default=4)
    p.add_argument("--reps", type=int, default=20)
    a = p.parse_args()
    main(batch=a.batch, n_objects=a.objects, reps=a.reps)
