"""Flagship forward-path micro-benchmark + per-component breakdown.

Measures (honest host-synced timing, see CLAUDE.md rule 3):
  * HRNet-w18 backbone forward
  * full PoseNet forward + decode (XLA and fused-Pallas EdgeConv variants)
at a chosen batch, and reports achieved TFLOPs vs the ~155 TFLOPs bf16
peak measured on this v5e (BENCH.md).

Usage: python benchmarks/bench_forward.py [--batch 256]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def timed(fn, sync, reps=10):
    sync(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn())
    return (time.perf_counter() - t0) / reps


def main(batch=256):
    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.models.hrnet import HRNetFeatures
    from checkerpose_tpu.ops.knn import knn_index
    from checkerpose_tpu.ops.geometry import pc_normalize
    from checkerpose_tpu.train import steps

    rng = np.random.default_rng(0)
    p3d = rng.uniform(-40, 40, (512, 3)).astype(np.float32)
    p3dn = pc_normalize(p3d).astype(np.float32)
    knn = knn_index(p3dn, 20)
    net = PoseNet(npoint=512, res_log2=6, backbone_name="hrnet_w18",
                  num_graph_module=3, init_num_graph_module=2, local_k=2)
    img0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = jax.jit(net.init, static_argnames=("stage", "train"))(
        jax.random.PRNGKey(0), img0, knn, jnp.asarray(p3dn)[None], stage=3,
        train=False)

    imgs = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3)), jnp.uint8)
    batch_d = {
        "image": imgs,
        "bbox": jnp.tile(jnp.asarray([50., 60., 130., 130.]), (batch, 1)),
        "p3d_normed": jnp.tile(jnp.asarray(p3dn)[None], (batch, 1, 1)),
    }

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    # backbone only
    bb = HRNetFeatures("hrnet_w18")
    bvar = {"params": variables["params"]["init_net"]["backbone"],
            "batch_stats": variables["batch_stats"]["init_net"]["backbone"]}
    x = imgs.astype(jnp.bfloat16) / 255.0
    bfwd = jax.jit(lambda v, x: bb.apply(v, x, train=False))
    dt_bb = timed(lambda: bfwd(bvar, x), lambda o: sync(o[0]))
    print(f"backbone fwd  b{batch}: {dt_bb*1000:.1f} ms = {batch/dt_bb:.0f} im/s")

    # full forward + decode (XLA)
    fwd = steps.make_pose_forward(net, knn, stage=3)
    dt_f = timed(lambda: fwd(variables, batch_d), sync)
    print(f"posenet fwd   b{batch}: {dt_f*1000:.1f} ms = {batch/dt_f:.0f} crops/s")

    # fused Pallas EdgeConv variant
    from checkerpose_tpu.models.fused import make_fused_pose_forward
    ffwd = make_fused_pose_forward(net, knn, 3, variables)
    dt_p = timed(lambda: ffwd(variables, batch_d), sync)
    print(f"posenet fused b{batch}: {dt_p*1000:.1f} ms = {batch/dt_p:.0f} crops/s "
          f"({dt_f/dt_p:.2f}x)")

    # roofline: XLA's own FLOP/byte estimates for the compiled programs
    # (cost_analysis flops are the compiler's count of executed HLO flops)
    for name, f, args, dt in (
            ("backbone", bfwd, (bvar, x), dt_bb),
            ("posenet+decode", fwd, (variables, batch_d), dt_f)):
        try:
            ca = f.lower(*args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = float(ca.get("flops", 0.0))
            by = float(ca.get("bytes accessed", 0.0))
            tf = fl / dt / 1e12
            gbs = by / dt / 1e9
            print(f"roofline {name}: {fl/1e9:.1f} GFLOP, {by/1e9:.2f} GB "
                  f"-> {tf:.1f} TFLOP/s ({tf/155*100:.0f}% of 155 peak), "
                  f"{gbs:.0f} GB/s, intensity {fl/max(by,1):.0f} flop/B")
        except Exception as e:  # cost_analysis availability varies by backend
            print(f"roofline {name}: unavailable ({e})")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    a = p.parse_args()
    main(batch=a.batch)
