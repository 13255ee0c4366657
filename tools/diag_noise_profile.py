"""Solver attribution under the CURRENT net's per-bit error profile.

Feeds GT codes corrupted by INDEPENDENT per-bit flips at the rates the
round-3 net measures on held-out data (MSB->LSB x-bits @ step 15.6k:
[0.016 0.05 0.135 0.335 0.478 0.50]) through the official hard decode +
batched RANSAC-EPnP, sweeping (num_hyp, reproj_thresh).

Finding (2026-08-19): the official config (128 hyp / 2 px) recovers
ADD@0.1d = 0.81, median ADD 6.4 mm under this profile — while the real net
hard-decodes to only ~0.21 on the same metric. Therefore the net's bit
errors are spatially CORRELATED per image (whole regions wrong together),
which PnP cannot average out; the hard-decode gap is a training/model
issue, not a solver issue. Also measured: MORE hypotheses hurt under heavy
noise (512/2px = 0.56): extra draws overfit noise-consistent subsets. The
reference's threshold=2px (test_network_with_test_data.py:35,79,104) is
near-optimal here too — no parity-safe solver lever exists.

Usage: nice -n 19 python tools/diag_noise_profile.py
"""
import os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
sys.path.insert(0, "/root/repo/tests")
from test_oracle_noise import _scenes, K, RES, L
from checkerpose_tpu.ops.codes import ids_to_codes, codes_to_ids
from checkerpose_tpu.eval.decode import ids_to_correspondences
from checkerpose_tpu.eval import metrics as M
from checkerpose_tpu.solver.ransac import solve_poses_batched

# per-bit flip profile measured on the r3 net @15.6k (MSB->LSB)
PROF = np.array([0.016, 0.05, 0.135, 0.335, 0.478, 0.50])
p3d, diameter, scenes = _scenes(n_img=16)
rng = np.random.default_rng(7)
p2d_b, valid_b = [], []
for (Q, t, bbox, roi, x_id, y_id) in scenes:
    xc = np.asarray(ids_to_codes(jnp.asarray(x_id), L))
    yc = np.asarray(ids_to_codes(jnp.asarray(y_id), L))
    xc = np.abs(xc - (rng.random(xc.shape) < PROF[None, :]))
    yc = np.abs(yc - (rng.random(yc.shape) < PROF[None, :]))
    xn = np.asarray(codes_to_ids(jnp.asarray(xc, jnp.int32)))
    yn = np.asarray(codes_to_ids(jnp.asarray(yc, jnp.int32)))
    p2d, valid = ids_to_correspondences(
        jnp.asarray(xn)[None], jnp.asarray(yn)[None],
        jnp.asarray(roi)[None], jnp.asarray(bbox, jnp.float32)[None],
        crop_size_gt=RES)
    p2d_b.append(np.asarray(p2d)[0]); valid_b.append(np.asarray(valid)[0])
R_gt = jnp.asarray(np.stack([s[0] for s in scenes]), jnp.float32)
t_gt = jnp.asarray(np.stack([s[1] for s in scenes]), jnp.float32)
cell = float(np.mean([s[2][2] for s in scenes])) / RES
print(f"cell px = {cell:.2f}, diameter = {diameter:.1f}")
for (hyp, th, lbl) in [(128, 2.0, "official 128/2px"),
                       (512, 2.0, "512/2px"),
                       (128, cell, "128/cell"),
                       (512, cell, "512/cell"),
                       (512, 2*cell, "512/2cell")]:
    sol = solve_poses_batched(jnp.asarray(p3d), jnp.asarray(np.stack(p2d_b)),
                              jnp.asarray(np.stack(valid_b)), jnp.asarray(K),
                              jax.random.PRNGKey(0), num_hyp=hyp, reproj_thresh=th)
    errs = M.batched_pose_errors(sol["R"], sol["t"], R_gt, t_gt, jnp.asarray(p3d), use_adi=False)
    adx = np.asarray(errs["adx"])
    print(f"{lbl:18s} adx10={float((adx<0.1*diameter).mean()):.3f} "
          f"adx20={float((adx<0.2*diameter).mean()):.3f} medianADD={np.median(adx):.2f}mm")
