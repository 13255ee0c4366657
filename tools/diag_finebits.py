"""Diagnose the test-ADD decline: are the unlearned fine bits (LSBs) decoding
with a SYSTEMATIC bias (e.g. logits drifting negative -> every keypoint snaps
to the top-left sub-cell), which would shift all correspondences coherently
and corrupt the pose, vs zero-mean noise (which RANSAC+GN would average out)?

Compares three decodes through the SAME solver on the same test images:
  raw   : hard ids as trained (current eval path)
  trunc<k>: keep k MSBs, replace the rest with the uniform within-block
            expectation ((2^(L-k)-1)/2) -- what a bias-free uncertain tail
            should average to
  soft  : expected id  sum_i sigmoid(logit_i) * 2^(L-1-i)  (per-bit
            confidence-weighted; equals raw when bits are confident)

Usage: CHECKERPOSE_PLATFORM=cpu python tools/diag_finebits.py [--n 48]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CHECKERPOSE_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.cli import common
from checkerpose_tpu.cli.train import build_pose_net
from checkerpose_tpu.eval import metrics as M
from checkerpose_tpu.eval.decode import ids_to_correspondences
from checkerpose_tpu.ops import codes as _codes
from checkerpose_tpu.ops import geometry as _geom
from checkerpose_tpu.solver.ransac import solve_poses_batched
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import create_pose_state, make_optimizer


def main(cfg, n_images=48):
    xyz, normed, knn = common.load_keypoints(cfg)
    npoint = xyz.shape[0]
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    net = build_pose_net(cfg, npoint)
    state = create_pose_state(net, knn, crop_img, make_optimizer(1e-4), npoint)
    mgr = CheckpointManager(cfg["check_point_path"])
    state = mgr.restore_eval(state)
    print(f"latest checkpoint step {state.step}")

    res = 2 ** net.res_log2
    L = net.res_log2
    loader, _ = common.build_test_loader(cfg, xyz, batch_size=16, crop_gt=res)
    diameter = common.object_diameter(cfg)
    p3dn = normed.astype(np.float32)
    fwd = steps.make_pose_forward(net, knn, net.num_refine_steps)
    variables = state.variables()
    key = jax.random.PRNGKey(0)

    variants = ["raw", "adapt2", "adapt3", "adapt4", "adapt5", "adapt6",
                "adapt2+h", "adapt3+h", "adapt4+h"]
    adds = {v: [] for v in variants}
    bias_sum = np.zeros(2)
    gt_mean_lsb = np.zeros(2)
    pred_bit_mean = np.zeros((2, L))
    gt_bit_mean = np.zeros((2, L))
    n_kp = 0
    seen = 0

    for batch in loader:
        if seen >= n_images:
            break
        n_real = int(batch.get("n_real", len(batch["image"])))
        fb = {k: batch[k] for k in ("image", "p3d_normed", "obj_idx") if k in batch}
        fb["p3d_normed"] = np.tile(p3dn[None], (len(batch["image"]), 1, 1))
        out = fwd(variables, fb)
        key, sub = jax.random.split(key)
        bbox = jnp.asarray(batch["bbox"])
        gt_bit, gt_x, gt_y = jax.vmap(
            lambda p, b: _geom.make_code_labels(p, b, crop_size_gt=res))(
            jnp.asarray(batch["proj_xy"]), bbox)

        x_id = out["x_id"].astype(jnp.float32)
        y_id = out["y_id"].astype(jnp.float32)
        sx = jax.nn.sigmoid(out["x_logits"].astype(jnp.float32))
        sy = jax.nn.sigmoid(out["y_logits"].astype(jnp.float32))
        w = jnp.asarray(2.0 ** np.arange(L - 1, -1, -1), jnp.float32)
        soft_x = jnp.sum(sx * w, axis=-1)
        soft_y = jnp.sum(sy * w, axis=-1)

        ids = {"raw": (x_id, y_id), "soft": (soft_x, soft_y)}
        for k in (4, 3):
            blk = 2 ** (L - k)
            c = (blk - 1) / 2.0
            ids[f"trunc{k}"] = (jnp.floor(x_id / blk) * blk + c,
                                jnp.floor(y_id / blk) * blk + c)
        # adaptive: hard bit where |logit| > tau, 0.5 (block center) where not
        xb = _codes.ids_to_codes(out["x_id"], L).astype(jnp.float32)
        yb = _codes.ids_to_codes(out["y_id"], L).astype(jnp.float32)
        for tau in (2, 3, 4, 5, 6):
            cx = jnp.abs(out["x_logits"].astype(jnp.float32)) > tau
            cy = jnp.abs(out["y_logits"].astype(jnp.float32)) > tau
            ax = jnp.sum(jnp.where(cx, xb, 0.5) * w, axis=-1)
            ay = jnp.sum(jnp.where(cy, yb, 0.5) * w, axis=-1)
            ids[f"adapt{tau}"] = (ax, ay)
        # +h: +0.5 cell (decode to cell CENTER; GT ids floor the projection,
        # so corner decode carries a systematic -half-cell offset)
        for tau in (2, 3, 4):
            ids[f"adapt{tau}+h"] = (ids[f"adapt{tau}"][0] + 0.5,
                                    ids[f"adapt{tau}"][1] + 0.5)

        # bias bookkeeping on GT-in-roi keypoints
        m = np.asarray(gt_bit) > 0.5
        dx = np.asarray(x_id - gt_x.astype(jnp.float32))[m]
        dy = np.asarray(y_id - gt_y.astype(jnp.float32))[m]
        bias_sum += [dx.sum(), dy.sum()]
        pb_x = np.asarray(_codes.ids_to_codes(out["x_id"], L))[m]
        pb_y = np.asarray(_codes.ids_to_codes(out["y_id"], L))[m]
        gb_x = np.asarray(_codes.ids_to_codes(gt_x, L))[m]
        gb_y = np.asarray(_codes.ids_to_codes(gt_y, L))[m]
        pred_bit_mean += [pb_x.sum(0), pb_y.sum(0)]
        gt_bit_mean += [gb_x.sum(0), gb_y.sum(0)]
        n_kp += int(m.sum())

        camK = jnp.asarray(batch["cam_K"])
        R_gt = jnp.asarray(batch["R"])
        t_gt = jnp.asarray(batch["t"]).reshape(-1, 3)
        valid_s = np.asarray(batch["valid"]) > 0.5
        B = len(batch["image"])

        p2d_all, valid_all = [], []
        for v in variants:
            xi, yi = ids[v]
            p2d, valid = ids_to_correspondences(
                xi.astype(jnp.int32) if v == "raw" else xi, yi.astype(jnp.int32) if v == "raw" else yi,
                out["roi_mask"], bbox, crop_size_gt=res,
                seg_mask=out["seg_visib"], check_seg=False)
            # NOTE: ids_to_correspondences floors float ids through the seg
            # lookup only; p2d itself is ids*scale so float ids are fine.
            p2d_all.append(p2d)
            valid_all.append(valid)
        nm = len(variants)
        sol = solve_poses_batched(
            jnp.asarray(xyz, jnp.float32), jnp.concatenate(p2d_all),
            jnp.concatenate(valid_all), jnp.tile(camK, (nm, 1, 1)), sub,
            num_hyp=128, reproj_thresh=2.0)
        errs = M.batched_pose_errors(
            sol["R"], sol["t"], jnp.tile(R_gt, (nm, 1, 1)),
            jnp.tile(t_gt, (nm, 1)), jnp.asarray(xyz, jnp.float32),
            use_adi=bool(cfg.get("is_symmetric", False)))
        adx = np.asarray(errs["adx"])
        ok = np.asarray(sol["success"])
        for i, v in enumerate(variants):
            sl = slice(i * B, (i + 1) * B)
            a = np.where(ok[sl] & valid_s, adx[sl], np.inf)[:n_real]
            adds[v].append(a)
        seen += n_real

    print(f"\n== {seen} test images, {n_kp} in-roi keypoints ==")
    print(f"mean id bias (pred - gt) cells: x={bias_sum[0]/n_kp:+.3f} "
          f"y={bias_sum[1]/n_kp:+.3f}  (1 cell = {256//res} px in crop)")
    for ax, name in ((0, "x"), (1, "y")):
        pm = pred_bit_mean[ax] / n_kp
        gm = gt_bit_mean[ax] / n_kp
        print(f"{name} bits MSB->LSB  pred_mean=[{' '.join(f'{v:.2f}' for v in pm)}]")
        print(f"                 gt_mean  =[{' '.join(f'{v:.2f}' for v in gm)}]")
    for v in variants:
        e = np.concatenate(adds[v])
        for frac in (0.05, 0.10, 0.20):
            r = float((e < frac * diameter).mean())
            print(f"{v:<7} ADD@{frac:.2f}d = {r:.4f}", end="  ")
        print(f"medianADD={np.median(e[np.isfinite(e)]):.2f}mm d={diameter:.1f}mm")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt")
    p.add_argument("--obj_name", default="obj01")
    p.add_argument("--n", type=int, default=48)
    a = p.parse_args()
    cfg = common.resolve_cfg(a.cfg, a.obj_name, {})
    main(cfg, n_images=a.n)
