"""Per-image global bias of the decoded correspondence field.

Measures, per test image, (a) the radial scale bias -- least-squares slope
of the radial component of (pred - gt) id error against distance from the
keypoint centroid -- and (b) the mean signed x/y error. Round-3 result at
step 17.4k (32 images):

    radial scale bias mean -0.042 (i.e. -4.2% shrinkage), per-image sd
    0.069, range [-0.178, +0.087]; per-image mean dy sd 0.49 cells (34% of
    images shifted > 0.5 cell).

This is the error structure diag_noise_profile.py predicted: a -4% radial
shrink is indistinguishable from +4% depth for PnP (~18 mm at z~450 --
precisely the observed median ADD), and a per-image +-7% scale spread means
no global calibration can fix it. The net's implicit per-image object
scale/offset estimate (forced by the reference's +-25% train-time bbox
jitter) is the bottleneck; per-keypoint noise is secondary. Round-4 lever:
train the backbone/binding better (pretrained weights or longer schedule),
not the solver.

Usage: CHECKERPOSE_PLATFORM=cpu nice -n 19 python tools/diag_scale_bias.py
"""
import os, sys
import os; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from checkerpose_tpu.cli import common
from checkerpose_tpu.cli.train import build_pose_net
from checkerpose_tpu.ops import geometry as _geom
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import create_pose_state, make_optimizer

cfg = common.resolve_cfg("config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt", "obj01", {})
xyz, normed, knn = common.load_keypoints(cfg)
npoint = xyz.shape[0]
net = build_pose_net(cfg, npoint)
state = create_pose_state(net, knn, 256, make_optimizer(1e-4), npoint)
mgr = CheckpointManager(cfg["check_point_path"])
state = mgr.restore_eval(state)
print(f"ckpt step {state.step}")
res = 2 ** net.res_log2
loader, _ = common.build_test_loader(cfg, xyz, batch_size=16, crop_gt=res)
p3dn = normed.astype(np.float32)
fwd = steps.make_pose_forward(net, knn, net.num_refine_steps)
variables = state.variables()

slopes, mx, my, zerr = [], [], [], []
seen = 0
for batch in loader:
    if seen >= 32: break
    fb = {"image": batch["image"], "p3d_normed": np.tile(p3dn[None], (len(batch["image"]),1,1))}
    out = fwd(variables, fb)
    bbox = jnp.asarray(batch["bbox"])
    gt_bit, gt_x, gt_y = jax.vmap(lambda p,b: _geom.make_code_labels(p,b,crop_size_gt=res))(
        jnp.asarray(batch["proj_xy"]), bbox)
    m = np.asarray(gt_bit) > 0.5
    gx = np.asarray(gt_x, np.float64); gy = np.asarray(gt_y, np.float64)
    px_ = np.asarray(out["x_id"], np.float64); py_ = np.asarray(out["y_id"], np.float64)
    for b in range(len(gx)):
        mb = m[b]
        if mb.sum() < 64: continue
        dx = px_[b][mb]-gx[b][mb]; dy = py_[b][mb]-gy[b][mb]
        cx, cy = gx[b][mb].mean(), gy[b][mb].mean()
        r = np.stack([gx[b][mb]-cx, gy[b][mb]-cy])      # (2, n) position from centroid
        d = np.stack([dx, dy])
        # radial scale bias: slope of (d . r_hat) vs |r|
        rn = np.linalg.norm(r, axis=0) + 1e-9
        rad = (d*r).sum(0)/rn
        A = np.stack([rn, np.ones_like(rn)]).T
        s, _ = np.linalg.lstsq(A, rad, rcond=None)[0]
        slopes.append(s); mx.append(dx.mean()); my.append(dy.mean())
    seen += len(gx)
slopes=np.array(slopes); mx=np.array(mx); my=np.array(my)
print(f"images: {len(slopes)}")
print(f"radial scale bias (cells err per cell radius): mean={slopes.mean():+.4f} "
      f"sd={slopes.std():.4f} range=[{slopes.min():+.3f},{slopes.max():+.3f}]")
print(f"per-image mean dx: mean={mx.mean():+.3f} sd={mx.std():.3f} |dx|>0.5cell: {(np.abs(mx)>0.5).mean():.2f}")
print(f"per-image mean dy: mean={my.mean():+.3f} sd={my.std():.3f} |dy|>0.5cell: {(np.abs(my)>0.5).mean():.2f}")
