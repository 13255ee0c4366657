"""Per-segment forward-path attribution for the flagship PoseNet.

Times each piece of the inference forward separately (host-synced — see
CLAUDE.md rule 3: materialize a result-derived scalar per rep), so the round
budget goes to the segment that actually dominates:

  normalize | backbone | init head (= init_net - backbone) | per-stage
  up_i / refine_i (direct submodule applies) | seg head | stage diffs of the
  full net (cross-check) | full forward+decode

plus XLA cost_analysis (FLOPs / bytes) per segment for a roofline view.

Usage: python benchmarks/bench_forward_segments.py [--batch 256] [--reps 10]
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


def timed(fn, sync, reps):
    sync(fn())  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        sync(fn())
    return (time.perf_counter() - t0) / reps


def cost(jitted, *args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def report(name, dt, batch, fl=0.0, by=0.0):
    line = f"{name:<22} {dt * 1e3:8.2f} ms  {batch / dt:8.0f} crops/s"
    if fl:
        line += (f"  {fl / 1e9:8.1f} GF {fl / dt / 1e12:6.1f} TF/s"
                 f" {by / 1e9:7.2f} GB {by / dt / 1e9:5.0f} GB/s")
    print(line)


def main(batch=256, reps=10):
    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.models.posenet import UpBlock, RefineBlock
    from checkerpose_tpu.models.init_net import InitNet
    from checkerpose_tpu.models.backbone import make_backbone
    from checkerpose_tpu.ops.knn import knn_index
    from checkerpose_tpu.ops.geometry import pc_normalize
    from checkerpose_tpu.train import steps
    from checkerpose_tpu.train.steps import device_augment_normalize

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
    params, stats = variables["params"], variables["batch_stats"]

    imgs = jnp.asarray(rng.integers(0, 255, (batch, 256, 256, 3)), jnp.uint8)
    batch_d = {
        "image": imgs,
        "bbox": jnp.tile(jnp.asarray([50., 60., 130., 130.]), (batch, 1)),
        "p3d_normed": jnp.tile(jnp.asarray(p3dn)[None], (batch, 1, 1)),
    }

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0]))

    print(f"== per-segment forward attribution, batch {batch}, reps {reps} ==")

    # 0) normalize
    norm = jax.jit(lambda im: device_augment_normalize(im, None, False, False,
                                                       train=False))
    dt = timed(lambda: norm(imgs), lambda o: sync(o), reps)
    fl, by = cost(norm, imgs)
    report("normalize", dt, batch, fl, by)
    x_norm = norm(imgs)

    # 1) backbone
    bb = make_backbone("hrnet_w18")
    bvar = {"params": params["init_net"]["backbone"],
            "batch_stats": stats["init_net"]["backbone"]}
    bfwd = jax.jit(lambda v, x: bb.apply(v, x.astype(jnp.bfloat16), False))
    dt_bb = timed(lambda: bfwd(bvar, x_norm), lambda o: sync(o[0]), reps)
    fl, by = cost(bfwd, bvar, x_norm)
    report("backbone", dt_bb, batch, fl, by)
    feats = jax.tree.map(jax.block_until_ready, bfwd(bvar, x_norm))

    # 2) init net total -> head = total - backbone
    init = InitNet(npoint=512, res_log2=3, backbone_name="hrnet_w18",
                   num_conv1x1=1, num_graph_module=2)
    ivar = {"params": params["init_net"], "batch_stats": stats["init_net"]}
    ifwd = jax.jit(lambda v, x: init.apply(v, x, knn, train=False))
    dt_init = timed(lambda: ifwd(ivar, x_norm), lambda o: sync(o[0]), reps)
    fl, by = cost(ifwd, ivar, x_norm)
    report("init_net (bb+head)", dt_init, batch, fl, by)
    report("  init head (diff)", max(dt_init - dt_bb, 1e-9), batch)

    # 3) per-stage UpBlock / RefineBlock direct applies on synthetic inputs of
    # the true shapes (feat pyramid channels 128/256/512/1024 at 64/32/16/8)
    gfeat = jnp.zeros((batch, 512, 64), jnp.bfloat16)
    roi = jnp.ones((batch, 512, 1), jnp.float32)
    up_out = None
    for i in range(3):
        res_in = 2 ** (3 + i)
        if i == 0:
            fin = feats[-1]
        else:
            fin = jnp.concatenate([up_out, feats[-i - 1].astype(up_out.dtype)],
                                  axis=-1)
        upm = UpBlock(256, is_convtrans=(i == 0))
        uvar = {"params": params[f"up_{i}"], "batch_stats": stats[f"up_{i}"]}
        ufwd = jax.jit(lambda v, x, m=upm: m.apply(v, x, False))
        dt = timed(lambda: ufwd(uvar, fin), lambda o: sync(o), reps)
        fl, by = cost(ufwd, uvar, fin)
        report(f"up_{i} ({res_in}->{res_in * 2}, Cin={fin.shape[-1]})",
               dt, batch, fl, by)
        up_out = ufwd(uvar, fin)

        res = res_in * 2
        xid = jnp.asarray(rng.integers(0, res // 2, (batch, 512)), jnp.int32)
        yid = jnp.asarray(rng.integers(0, res // 2, (batch, 512)), jnp.int32)
        gdim = 64 if i == 0 else 256
        gf = jnp.zeros((batch, 512, gdim), jnp.bfloat16)
        rfm = RefineBlock(num_filters=256, num_graph_module=3, local_k=2)
        rvar = {"params": params[f"refine_{i}"],
                "batch_stats": stats[f"refine_{i}"]}
        rfwd = jax.jit(lambda v, im, g, xi, yi, m=rfm: m.apply(
            v, im, g, None, roi, xi, yi, knn, False))
        dt = timed(lambda: rfwd(rvar, up_out, gf, xid, yid),
                   lambda o: sync(o[0]), reps)
        fl, by = cost(rfwd, rvar, up_out, gf, xid, yid)
        report(f"refine_{i} (res {res})", dt, batch, fl, by)

    # 4) stage diffs of the full net (cross-check of 3)
    prev_dt = None
    for s in (1, 2, 3):
        fwd = steps.make_pose_forward(net, knn, stage=s)
        dt = timed(lambda: fwd(variables, batch_d), sync, reps)
        fl, by = cost(fwd, variables, batch_d)
        report(f"full fwd stage {s}", dt, batch, fl, by)
        if prev_dt is not None:
            report(f"  stage {s} marginal", max(dt - prev_dt, 1e-9), batch)
        prev_dt = dt

    # 5) fused-Pallas full variant
    from checkerpose_tpu.models.fused import make_fused_pose_forward
    ffwd = make_fused_pose_forward(net, knn, 3, variables)
    dt = timed(lambda: ffwd(variables, batch_d), sync, reps)
    report("full fwd fused", dt, batch)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--reps", type=int, default=10)
    a = p.parse_args()
    main(batch=a.batch, reps=a.reps)
