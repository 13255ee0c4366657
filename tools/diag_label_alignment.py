"""Diagnostic: do the binary-code labels point at image pixels that show the
keypoint's NOCS color? If yes, labels are image-consistent and the learning
failure is model/optimization-side; if no, the label pipeline is broken.

Runs on CPU, no jax needed for the core check.
"""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from checkerpose_tpu.data.bop_io import scan_bop_object
from checkerpose_tpu.data.dataset import CropDataset
from checkerpose_tpu.data.ply import load_ply_vertices
from checkerpose_tpu.ops import geometry

ROOT = "/tmp/synth_scale3"
DS = "synth"

verts = load_ply_vertices(os.path.join(ROOT, DS, "models", "obj_000001.ply"))
if isinstance(verts, tuple):
    verts = verts[0]
lo, hi = verts.min(0), verts.max(0)
ramp = 40.0 + 175.0 * (verts - lo) / (hi - lo + 1e-9)  # (V,3) expected draw color

fps = pickle.load(open(os.path.join(ROOT, DS, "fps_202212", "obj_000001.pkl"), "rb"))
kp_idx = fps["id"]            # (512,) rows into verts
kp_xyz = fps["xyz"]           # (512,3)
exp_color = ramp[kp_idx]      # color as DRAWN (channel order as in _render's obj array)

samples = scan_bop_object(ROOT, DS, "train_real", 1, 0.2)
print(f"{len(samples)} samples")
ds = CropDataset(samples, kp_xyz, is_train=True, crop_size_img=256,
                 crop_size_gt=64, padding_ratio=1.5,
                 resize_method="crop_square_resize", seed=0, use_native=False)

all_sampled, all_expected, n_checked = [], [], 0
pix_err = []
for t in range(16):
    it = ds[t * 37]
    img = it["image"].astype(np.float32)      # (256,256,3) RGB
    bbox = it["bbox"]; R, tt = it["R"], it["t"]; K = it["cam_K"]
    proj_xy = it["proj_xy"]

    # labels exactly as the jitted step computes them
    roi, x_id, y_id = geometry.make_code_labels(proj_xy, bbox, 64)
    roi = np.asarray(roi); x_id = np.asarray(x_id); y_id = np.asarray(y_id)

    # continuous crop-space projection (for sub-cell pixel error of the codes)
    u_cont = (proj_xy[:, 0] - bbox[0]) / bbox[2] * 64.0
    v_cont = (proj_xy[:, 1] - bbox[1]) / bbox[3] * 64.0
    pix_err.append(np.abs(np.stack([x_id + 0.5 - u_cont, y_id + 0.5 - v_cont], -1))[roi > 0])

    # front-facing filter: occluded if any mesh vertex projects within r px
    # at clearly smaller depth
    allp, alld = geometry.project_pts(verts, K, R, tt)
    kp_p, kp_d = allp[kp_idx], alld[kp_idx]
    d2 = ((allp[None, :, :] - kp_p[:, None, :]) ** 2).sum(-1)  # (512,V)
    occ = ((d2 < 9.0) & (alld[None, :] < kp_d[:, None] - 8.0)).any(1)
    front = (~occ) & (roi > 0)

    # sample the crop at the label location (crop 256 = 4x the 64-grid)
    u = np.clip(((x_id + 0.5) * 4).astype(int), 0, 255)
    v = np.clip(((y_id + 0.5) * 4).astype(int), 0, 255)
    col = img[v, u]                            # (512,3) RGB
    all_sampled.append(col[front]); all_expected.append(exp_color[front])
    n_checked += int(front.sum())

s = np.concatenate(all_sampled); e = np.concatenate(all_expected)
pix_err = np.concatenate(pix_err)
print(f"checked {n_checked} front-facing in-roi keypoints")
print(f"code quantization pixel err (64-grid units): mean {pix_err.mean():.3f} "
      f"(should be ~0.25-0.5 if labels land in the right cell)")
for name, ee in (("drawn-order", e), ("flipped", e[:, ::-1])):
    cors = [np.corrcoef(s[:, c], ee[:, c])[0, 1] for c in range(3)]
    print(f"corr(sampled crop color, expected NOCS) {name}: "
          + " ".join(f"{c:.3f}" for c in cors))
# control: shuffled pairing should be ~0
rng = np.random.default_rng(0)
perm = rng.permutation(len(s))
cors = [np.corrcoef(s[perm, c], e[:, ::-1][:, c])[0, 1] for c in range(3)]
print("control (shuffled):", " ".join(f"{c:.3f}" for c in cors))
