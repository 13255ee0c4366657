"""Model-free root-cause diagnostic for the hard-decode filter collapse.

Round-4 observation (ACCURACY.md): with fine bits at chance, hard-decode
adx10 = 0.305 unfiltered but 0.008/0.031 under the full/visib seg filters —
the reference protocol exports the FILTERED poses
(`/root/reference/checkerpose/test.py:114-119,370-375`), so this collapse
poisons the protocol number. Adaptive decode repairs it (0.281 visib).

Mechanism hypothesis (tested here, NO trained model needed): the seg filter
keeps a correspondence only when its PREDICTED pixel lands on the predicted
mask (`eval/decode.py::ids_to_correspondences`, reference
`test_network_with_test_data.py:56-62`). For a keypoint whose true 2D
position is near the silhouette boundary, chance-level fine bits displace
the prediction uniformly within the finest CONFIDENT cell — but only the
displacements that land INSIDE the silhouette survive the filter. The
filter therefore truncates the noise distribution asymmetrically: surviving
correspondences are biased toward the object interior (a radial shrink of
the 2D field), which EPnP absorbs as a depth/scale error — a systematic
pose bias, not extra variance. Unfiltered solves see symmetric noise and
RANSAC averages it out.

Protocol: synthetic object + known pose -> GT 64-res ids; corrupt the k
finest bits uniformly (the "chance bits" regime); solve with no filter /
with a PERFECT silhouette as the seg filter / with the filter judged at the
confident (coarse) resolution instead of the noisy fine ids. Reports
adx10-style ADD pass rates, surviving-correspondence counts, and the fitted
radial scale of surviving predictions (alpha < 1 = inward bias).

Run on the CPU platform in a quiet window (compiles the batched solver):
  CHECKERPOSE_PLATFORM=cpu python tools/diag_filter_collapse.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CHECKERPOSE_PLATFORM", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.eval.decode import ids_to_correspondences
from checkerpose_tpu.eval import metrics as M
from checkerpose_tpu.solver.ransac import solve_poses_batched

RES = 64          # finest id resolution (res_log2 = 6)
CHANCE_BITS = 2   # bits 4-5 at chance (the measured regime)
NPT = 512
B = 32            # images
CROP = 256.0


def main():
    rng = np.random.default_rng(5)
    # blobby convex-ish object, ~60 mm diameter (synthetic.py scale)
    sphere = rng.standard_normal((NPT, 3))
    sphere /= np.linalg.norm(sphere, axis=1, keepdims=True)
    radii = 22.0 + 8.0 * np.sin(3.0 * sphere[:, 0]) * np.cos(2.0 * sphere[:, 1])
    p3d = (sphere * radii[:, None]).astype(np.float32)
    diameter = float(np.linalg.norm(p3d[:, None] - p3d[None], axis=-1).max())

    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    R_gt, t_gt, bbox, gt_xid, gt_yid, seg = [], [], [], [], [], []
    for b in range(B):
        # random rotation via QR
        Q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = np.array([rng.uniform(-30, 30), rng.uniform(-30, 30),
                      rng.uniform(380, 520)], np.float32)
        cam = p3d @ Q.T + t
        uv = (cam @ K.T)
        uv = uv[:, :2] / uv[:, 2:3]
        # square crop around the projection with the reference 1.5 padding
        c = 0.5 * (uv.min(0) + uv.max(0))
        side = 1.5 * (uv.max(0) - uv.min(0)).max()
        bb = np.array([c[0] - side / 2, c[1] - side / 2, side, side], np.float32)
        rel = (uv - bb[:2]) / side * RES
        xid = np.clip(np.floor(rel[:, 0]), 0, RES - 1).astype(np.int32)
        yid = np.clip(np.floor(rel[:, 1]), 0, RES - 1).astype(np.int32)
        # perfect silhouette on the 64x64 crop grid: cells within the
        # projected point cloud's coverage (morphological-ish fill by
        # marking cells whose nearest projected point is < 2 cells away)
        gx, gy = np.meshgrid(np.arange(RES) + 0.5, np.arange(RES) + 0.5)
        pts = np.stack([gx.ravel(), gy.ravel()], -1)              # (HW, 2)
        d2 = ((pts[:, None, :] - rel[None, :, :]) ** 2).sum(-1).min(1)
        mask = (d2 < 2.0 ** 2).reshape(RES, RES).astype(np.float32)
        R_gt.append(Q.astype(np.float32)); t_gt.append(t); bbox.append(bb)
        gt_xid.append(xid); gt_yid.append(yid); seg.append(mask)
    R_gt = np.stack(R_gt); t_gt = np.stack(t_gt); bbox = np.stack(bbox)
    gt_xid = np.stack(gt_xid); gt_yid = np.stack(gt_yid); seg = np.stack(seg)

    # chance fine bits: randomize the CHANCE_BITS least-significant bits.
    # Optionally (a) flip bit3 with the measured ~0.35 error rate and (b)
    # apply the measured per-image radial shrink of the decoded field
    # (ACCURACY.md finding 5: -4% +- 7%) BEFORE quantization — the round-4
    # regime, not clean uniform noise.
    bit3_flip = float(os.environ.get("DIAG_BIT3_FLIP", "0.0"))
    shrink = float(os.environ.get("DIAG_RADIAL_SHRINK", "0.0"))
    base_x, base_y = gt_xid, gt_yid
    if shrink > 0:
        sx_ = np.empty_like(gt_xid, dtype=np.float64)
        sy_ = np.empty_like(gt_yid, dtype=np.float64)
        for b in range(B):
            a = 1.0 - rng.normal(shrink, 0.07)
            cx0 = gt_xid[b].mean(); cy0 = gt_yid[b].mean()
            sx_[b] = cx0 + (gt_xid[b] - cx0) * a
            sy_[b] = cy0 + (gt_yid[b] - cy0) * a
        base_x = np.clip(sx_, 0, RES - 1).astype(np.int32)
        base_y = np.clip(sy_, 0, RES - 1).astype(np.int32)
    noise = rng.integers(0, 2 ** CHANCE_BITS, gt_xid.shape)
    nx = (base_x >> CHANCE_BITS << CHANCE_BITS) | noise
    noise = rng.integers(0, 2 ** CHANCE_BITS, gt_yid.shape)
    ny = (base_y >> CHANCE_BITS << CHANCE_BITS) | noise
    if bit3_flip > 0:
        flip = rng.random(nx.shape) < bit3_flip
        nx = np.where(flip, nx ^ (1 << CHANCE_BITS), nx)
        flip = rng.random(ny.shape) < bit3_flip
        ny = np.where(flip, ny ^ (1 << CHANCE_BITS), ny)
    # optionally erode the "predicted" seg (mid-training masks threshold
    # conservatively): keep cells whose distance to the point cloud is small
    erode = float(os.environ.get("DIAG_MASK_ERODE", "0.0"))
    if erode > 0:
        gx, gy = np.meshgrid(np.arange(RES) + 0.5, np.arange(RES) + 0.5)
        pts = np.stack([gx.ravel(), gy.ravel()], -1)
        for b in range(B):
            rel = np.stack([gt_xid[b] + 0.5, gt_yid[b] + 0.5], -1)
            d2 = ((pts[:, None, :] - rel[None, :, :]) ** 2).sum(-1).min(1)
            seg[b] = (d2 < (2.0 - erode) ** 2).reshape(RES, RES).astype(np.float32)
    roi = np.ones((B, NPT), np.float32)
    # coarse-judged filter ids: the confident prefix cell's CENTER pixel at
    # fine resolution (the mitigation leg)
    half = (2 ** CHANCE_BITS) // 2
    cx = (nx >> CHANCE_BITS << CHANCE_BITS) + half
    cy = (ny >> CHANCE_BITS << CHANCE_BITS) + half

    key = jax.random.PRNGKey(0)
    legs = {
        "none": dict(check_seg=False, fxy=None),
        "visib(fine ids)": dict(check_seg=True, fxy=(nx, ny)),
        "visib(coarse-judged)": dict(check_seg=True, fxy=(cx, cy)),
    }
    print(f"object diameter {diameter:.1f} mm, {B} images, chance bits = "
          f"last {CHANCE_BITS} of {int(np.log2(RES))}")
    for name, leg in legs.items():
        fkw = {}
        if leg["fxy"] is not None:
            fkw = {"filter_x_id": jnp.asarray(leg["fxy"][0]),
                   "filter_y_id": jnp.asarray(leg["fxy"][1])}
        p2d, valid = ids_to_correspondences(
            jnp.asarray(nx), jnp.asarray(ny), jnp.asarray(roi),
            jnp.asarray(bbox), crop_size_gt=RES,
            seg_mask=jnp.asarray(seg) if leg["check_seg"] else None,
            check_seg=leg["check_seg"], **fkw)
        sol = solve_poses_batched(jnp.asarray(p3d), p2d, valid,
                                  jnp.tile(K[None], (B, 1, 1)), key,
                                  num_hyp=64, reproj_thresh=2.0)
        errs = M.batched_pose_errors(sol["R"], sol["t"], jnp.asarray(R_gt),
                                     jnp.asarray(t_gt), jnp.asarray(p3d),
                                     use_adi=False)
        adx = np.asarray(errs["adx"])
        ok = np.asarray(sol["success"])
        adx10 = float(((adx < 0.1 * diameter) & ok).mean())
        nv = np.asarray(valid).sum(1)
        # radial scale of surviving predictions vs GT (alpha<1 = inward)
        alphas = []
        vnp = np.asarray(valid) > 0.5
        gt_rel = np.stack([gt_xid, gt_yid], -1).astype(np.float64) + 0.5
        pd_rel = np.stack([np.asarray(nx), np.asarray(ny)], -1) + 0.5
        for b in range(B):
            m = vnp[b]
            if m.sum() < 8:
                continue
            g = gt_rel[b][m] - gt_rel[b][m].mean(0)
            p = pd_rel[b][m] - pd_rel[b][m].mean(0)
            alphas.append((g * p).sum() / np.maximum((g * g).sum(), 1e-9))
        tz_bias = float((np.asarray(sol["t"])[:, 2] - t_gt[:, 2])[ok].mean()) if ok.any() else float("nan")
        print(f"  {name:22s} n_valid={nv.mean():6.1f}  adx10={adx10:.3f}  "
              f"radial_alpha={np.mean(alphas) if alphas else float('nan'):.4f}  "
              f"tz_bias={tz_bias:+.1f} mm")


if __name__ == "__main__":
    main()
