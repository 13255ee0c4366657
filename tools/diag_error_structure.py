"""Spatial structure of the net's id errors: WHY hard decode underperforms.

tools/diag_noise_profile.py proved independent per-bit noise at the net's
measured rates solves to ADD@0.1d 0.81 while the real net reaches ~0.21, so
the real errors must be structured. This tool quantifies the structure on
held-out test images:

  1. |id error| distribution in 4px cells (p50/p90/p99, per direction):
     boundary-jitter (+-1 cell) vs multi-cell failures.
  2. Per-image mean |id error|: are failures concentrated in a few images
     (global shift / scale sensitivity) or uniform?
  3. Neighbor correlation: Pearson r of the SIGNED id error between each
     keypoint and its knn graph neighbors. Independent noise -> r ~ 0;
     r >> 0 means neighboring keypoints err together (GNN smoothing /
     feature aliasing) which PnP cannot average out.
  4. Error vs GT sub-cell phase: P(bit-k wrong) as a function of the GT
     position's distance to the bit-k cell boundary. Boundary-concentrated
     errors are benign quantization jitter; phase-flat errors are real
     localization failures.

Usage: CHECKERPOSE_PLATFORM=cpu nice -n 19 python tools/diag_error_structure.py [--n 32]
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
from checkerpose_tpu.ops import geometry as _geom
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import create_pose_state, make_optimizer


def main(cfg, n_images=32):
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
    p3dn = normed.astype(np.float32)
    fwd = steps.make_pose_forward(net, knn, net.num_refine_steps)
    variables = state.variables()

    ex_all, ey_all = [], []          # signed id error per keypoint (in-roi)
    im_mean = []                     # per-image mean |err|
    phase_x, err_bit3 = [], []       # GT sub-cell phase at bit-3 scale
    seen = 0
    knn_np = np.asarray(knn)         # (N, K) neighbor indices

    nbr_pairs_x, nbr_pairs_y = [], []
    for batch in loader:
        if seen >= n_images:
            break
        fb = {"image": batch["image"],
              "p3d_normed": np.tile(p3dn[None], (len(batch["image"]), 1, 1))}
        out = fwd(variables, fb)
        bbox = jnp.asarray(batch["bbox"])
        gt_bit, gt_x, gt_y = jax.vmap(
            lambda p, b: _geom.make_code_labels(p, b, crop_size_gt=res))(
            jnp.asarray(batch["proj_xy"]), bbox)
        m = np.asarray(gt_bit) > 0.5                       # (B, N)
        dx = np.asarray(out["x_id"], np.float64) - np.asarray(gt_x, np.float64)
        dy = np.asarray(out["y_id"], np.float64) - np.asarray(gt_y, np.float64)
        for b in range(min(len(dx), n_images - seen)):
            mb = m[b]
            if mb.sum() < 32:
                continue
            ex_all.append(dx[b][mb]); ey_all.append(dy[b][mb])
            im_mean.append(0.5 * (np.abs(dx[b][mb]).mean()
                                  + np.abs(dy[b][mb]).mean()))
            # neighbor pairs (both in roi)
            for k in range(1, knn_np.shape[1]):
                nb = knn_np[:, k]
                ok = mb & mb[nb]
                nbr_pairs_x.append(np.stack([dx[b][ok], dx[b][nb][ok]]))
                nbr_pairs_y.append(np.stack([dy[b][ok], dy[b][nb][ok]]))
            # bit-3 phase: distance of the GT continuous position to the
            # nearest bit-3 cell boundary, in [0, 1] block fractions
            xr = (np.asarray(batch["proj_xy"])[b, :, 0]
                  - np.asarray(bbox)[b, 0]) / (np.asarray(bbox)[b, 2] / res)
            blk = 2 ** (L - 4)  # bit-3 block = 4 finest cells... (see below)
            # bit k splits blocks of 2^(L-k); phase within the 2^(L-1-k)*2
            # halves: use fractional position inside the bit-3 period
            period = 2 ** (L - 3 - 1 + 1)  # = 2^(L-3): ids per bit-3 period
            ph = (xr[mb] % period) / period
            gb = (np.asarray(gt_x[b])[mb] // (2 ** (L - 4))) % 2
            pb = (np.asarray(out["x_id"][b])[mb] // (2 ** (L - 4))) % 2
            phase_x.append(ph)
            err_bit3.append((gb != pb).astype(np.float64))
        seen += len(dx)

    ex = np.concatenate(ex_all); ey = np.concatenate(ey_all)
    print(f"\n== {len(im_mean)} images, {ex.size} in-roi keypoints ==")
    for name, e in (("x", ex), ("y", ey)):
        a = np.abs(e)
        print(f"|{name} id err| cells: p50={np.percentile(a,50):.2f} "
              f"p90={np.percentile(a,90):.2f} p99={np.percentile(a,99):.2f} "
              f"mean={a.mean():.2f}  share>2cells={float((a>2).mean()):.3f}")
    imn = np.array(im_mean)
    print(f"per-image mean|err| cells: min={imn.min():.2f} med={np.median(imn):.2f} "
          f"max={imn.max():.2f}  (uniform -> benign; heavy tail -> per-image failures)")
    px = np.concatenate(nbr_pairs_x, axis=1)
    py = np.concatenate(nbr_pairs_y, axis=1)
    rx = np.corrcoef(px)[0, 1]
    ry = np.corrcoef(py)[0, 1]
    print(f"neighbor error correlation: r_x={rx:.3f} r_y={ry:.3f} "
          f"(independent noise -> ~0)")
    ph = np.concatenate(phase_x); eb = np.concatenate(err_bit3)
    edges = np.linspace(0, 1, 9)
    rates = [eb[(ph >= a) & (ph < b)].mean() if ((ph >= a) & (ph < b)).any()
             else float("nan") for a, b in zip(edges[:-1], edges[1:])]
    print("bit-3 x error rate by sub-period phase (0/1 = boundary):")
    print("  " + " ".join(f"{r:.2f}" for r in rates))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt")
    p.add_argument("--obj_name", default="obj01")
    p.add_argument("--n", type=int, default=32)
    args = p.parse_args()
    cfg = common.resolve_cfg(args.cfg, args.obj_name, {})
    main(cfg, n_images=args.n)
