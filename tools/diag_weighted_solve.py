"""Experiment: confidence-weighted correspondences in the RANSAC solve.

The solver's `valid` enters hypothesis sampling (thresholded > 0.5) and every
inlier/consensus score multiplicatively, so fractional values act as weights.
Try valid' = floor + (1-floor) * conf, conf = per-keypoint fraction of
confident bits (|logit| > tau), on top of the adaptive decode.

Usage: python tools/diag_weighted_solve.py [--n 256] [--tau 3]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CHECKERPOSE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["CHECKERPOSE_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.cli import common
from checkerpose_tpu.cli.train import build_pose_net
from checkerpose_tpu.eval import metrics as M
from checkerpose_tpu.eval.decode import adaptive_ids, ids_to_correspondences
from checkerpose_tpu.solver.ransac import solve_poses_batched
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import create_pose_state, make_optimizer


def main(cfg, n_images=256, tau=3.0):
    xyz, normed, knn = common.load_keypoints(cfg)
    npoint = xyz.shape[0]
    net = build_pose_net(cfg, npoint)
    state = create_pose_state(net, knn, 256, make_optimizer(1e-4), npoint)
    mgr = CheckpointManager(cfg["check_point_path"])
    state = mgr.restore_eval(state, best=True)
    print(f"best checkpoint step {state.step}, tau={tau}")

    res = 2 ** net.res_log2
    loader, _ = common.build_test_loader(cfg, xyz, batch_size=16, crop_gt=res)
    diameter = common.object_diameter(cfg)
    p3dn = normed.astype(np.float32)
    fwd = steps.make_pose_forward(net, knn, net.num_refine_steps)
    variables = state.variables()
    key = jax.random.PRNGKey(0)

    floors = [1.0, 0.6, 0.4, 0.25, 0.1]      # 1.0 = unweighted control
    adds = {f: [] for f in floors}
    seen = 0
    for batch in loader:
        if seen >= n_images:
            break
        n_real = int(batch.get("n_real", len(batch["image"])))
        B = len(batch["image"])
        fb = {k: batch[k] for k in ("image", "p3d_normed", "obj_idx") if k in batch}
        fb["p3d_normed"] = np.tile(p3dn[None], (B, 1, 1))
        out = fwd(variables, fb)
        key, sub = jax.random.split(key)
        bbox = jnp.asarray(batch["bbox"])
        dec_x, dec_y = adaptive_ids(out["x_logits"], out["y_logits"], tau)
        seg = out["seg_visib"]
        p2d, valid = ids_to_correspondences(
            dec_x, dec_y, out["roi_mask"], bbox, crop_size_gt=res,
            seg_mask=seg, check_seg=True,
            filter_x_id=out["x_id"], filter_y_id=out["y_id"])
        conf = (jnp.mean((jnp.abs(out["x_logits"].astype(jnp.float32)) > tau)
                         .astype(jnp.float32), axis=-1)
                + jnp.mean((jnp.abs(out["y_logits"].astype(jnp.float32)) > tau)
                           .astype(jnp.float32), axis=-1)) / 2.0   # (B, N)
        camK = jnp.asarray(batch["cam_K"])
        R_gt = jnp.asarray(batch["R"])
        t_gt = jnp.asarray(batch["t"]).reshape(-1, 3)
        valid_s = np.asarray(batch["valid"]) > 0.5

        v_all = [valid * (f + (1.0 - f) * conf) for f in floors]
        nm = len(floors)
        sol = solve_poses_batched(
            jnp.asarray(xyz, jnp.float32), jnp.tile(p2d, (nm, 1, 1)),
            jnp.concatenate(v_all), jnp.tile(camK, (nm, 1, 1)), sub,
            num_hyp=128, reproj_thresh=2.0)
        errs = M.batched_pose_errors(
            sol["R"], sol["t"], jnp.tile(R_gt, (nm, 1, 1)),
            jnp.tile(t_gt, (nm, 1)), jnp.asarray(xyz, jnp.float32),
            use_adi=False)
        adx = np.asarray(errs["adx"])
        ok = np.asarray(sol["success"])
        for i, f in enumerate(floors):
            sl = slice(i * B, (i + 1) * B)
            adds[f].append(np.where(ok[sl] & valid_s, adx[sl], np.inf)[:n_real])
        seen += n_real

    print(f"== {seen} test images ==")
    for f in floors:
        e = np.concatenate(adds[f])
        line = f"floor={f:<5}"
        for frac in (0.05, 0.10, 0.20):
            line += f"  ADD@{frac:.2f}d={float((e < frac * diameter).mean()):.4f}"
        line += f"  median={np.median(e[np.isfinite(e)]):.2f}mm"
        print(line)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt")
    p.add_argument("--obj_name", default="obj01")
    p.add_argument("--n", type=int, default=256)
    p.add_argument("--tau", type=float, default=3.0)
    a = p.parse_args()
    cfg = common.resolve_cfg(a.cfg, a.obj_name, {})
    main(cfg, n_images=a.n, tau=a.tau)
