"""Full train-step throughput (fwd+bwd+adam, device aug+labels) on the
flagship PoseNet -- the number behind BENCH.md's schedule projections.

Host-synced per iteration (CLAUDE.md rule 3). A/B the matmul-upsample default
with CHECKERPOSE_BILINEAR_MATMUL=0/1 (the backward is where it should matter:
transposed matmuls instead of 4 scatter-adds per UpBlock).

Usage: python benchmarks/bench_train_step.py [--batch 32] [--reps 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(batch=32, reps=20):
    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.ops.knn import knn_index
    from checkerpose_tpu.ops.geometry import pc_normalize
    from checkerpose_tpu.train import steps
    from checkerpose_tpu.train.state import create_pose_state, make_optimizer

    rng = np.random.default_rng(0)
    p3d = rng.uniform(-40, 40, (512, 3)).astype(np.float32)
    p3dn = pc_normalize(p3d).astype(np.float32)
    knn = knn_index(p3dn, 20)
    net = PoseNet(npoint=512, res_log2=6, backbone_name="hrnet_w18",
                  num_graph_module=3, init_num_graph_module=2, local_k=2)
    opt = make_optimizer(1e-4)
    state = create_pose_state(net, knn, 256, opt, 512)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    step = steps.make_train_step(net, knn, opt, stage=3)

    B = batch
    bbox = np.tile(np.array([50, 60, 130, 130], np.float32), (B, 1))
    proj = np.stack([rng.uniform(60, 170, (B, 512)),
                     rng.uniform(70, 180, (B, 512))], -1).astype(np.float32)
    batch_d = {
        "image": rng.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8),
        "proj_xy": proj, "bbox": bbox,
        "mask_visib": (rng.random((B, 64, 64)) > 0.5).astype(np.float32),
        "mask_full": (rng.random((B, 64, 64)) > 0.3).astype(np.float32),
        "p3d_normed": np.tile(p3dn[None], (B, 1, 1)),
    }

    sd, m = step(sd, batch_d, jax.random.PRNGKey(0))     # compile
    float(m["loss"])
    t0 = time.perf_counter()
    for i in range(reps):
        sd, m = step(sd, batch_d, jax.random.PRNGKey(i))
        float(m["loss"])                                  # host sync
    dt = (time.perf_counter() - t0) / reps
    print(f"train step batch {B}: {dt * 1e3:.1f} ms  ({B / dt:.0f} im/s)  "
          f"bilinear_matmul={os.environ.get('CHECKERPOSE_BILINEAR_MATMUL', '1')}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--reps", type=int, default=20)
    a = p.parse_args()
    main(batch=a.batch, reps=a.reps)
