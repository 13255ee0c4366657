"""Diagnostic: can the init net OVERFIT a fixed 64-image batch?

Healthy gradients should drive raw x/y bit error well below 0.1 within a few
thousand steps on a memorizable set. If not, the failure seen in the full
proof run (x/y stuck at chance) is a gradient/architecture pathology, not a
data-scale problem.

Usage: python tools/diag_overfit.py [--backbone hrnet_w18] [--steps 3000]
       [--lr 2e-4] [--n 64] [--res_log2 3] [--f32]
"""
import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from checkerpose_tpu.cli import common  # noqa: F401  (sets compile cache)
import jax
import jax.numpy as jnp

from checkerpose_tpu.data.bop_io import scan_bop_object
from checkerpose_tpu.data.dataset import CropDataset, _stack
from checkerpose_tpu.models import InitNet
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.state import create_init_state, make_optimizer

p = argparse.ArgumentParser()
p.add_argument("--backbone", default="hrnet_w18")
p.add_argument("--steps", type=int, default=3000)
p.add_argument("--lr", type=float, default=2e-4)
p.add_argument("--n", type=int, default=64)
p.add_argument("--res_log2", type=int, default=3)
p.add_argument("--f32", action="store_true")
p.add_argument("--jitter", action="store_true",
               help="use train-style bbox jitter (fresh crops each epoch)")
p.add_argument("--aux", type=float, default=0.0,
               help="aux heatmap loss weight (the proposed from-scratch fix)")
args = p.parse_args()

cfg = {"bop_path": "/tmp/synth_scale3", "dataset_name": "synth",
       "obj_id": 1, "fps_version": "fps_202212", "num_p3d_log2": 9,
       "network_graph_k": 20}
xyz, normed, knn = common.load_keypoints(cfg)

samples = scan_bop_object("/tmp/synth_scale3", "synth", "train_real", 1, 0.2)[:args.n]
ds = CropDataset(samples, xyz, is_train=bool(args.jitter), crop_size_img=256,
                 crop_size_gt=128, padding_ratio=1.5,
                 resize_method="crop_square_resize", seed=0, use_native=False)
batch = _stack([ds[i] for i in range(len(samples))])
print(f"batch of {len(samples)} fixed crops; backbone={args.backbone} "
      f"lr={args.lr} res_log2={args.res_log2} f32={args.f32}", flush=True)

net = InitNet(npoint=xyz.shape[0], res_log2=args.res_log2,
              backbone_name=args.backbone,
              dtype=jnp.float32 if args.f32 else jnp.bfloat16)
opt = make_optimizer(args.lr)
state = create_init_state(net, knn, 256, opt)
sd = {"params": state.params, "batch_stats": state.batch_stats,
      "opt_state": state.opt_state}

step = steps.make_pretrain_step(net, knn, opt, crop_size_gt=128,
                                color_aug_prob=0.0, aux_heatmap_weight=args.aux)
eval_step = steps.make_init_eval_step(net, knn, crop_size_gt=128)

jb = {k: jnp.asarray(v) for k, v in batch.items()}
key = jax.random.PRNGKey(0)
t0 = time.time()
for i in range(1, args.steps + 1):
    key, k = jax.random.split(key)
    sd, metrics = step(sd, jb, k)
    if i % 200 == 0 or i == 1:
        m = {kk: float(vv) for kk, vv in metrics.items()}
        rep = eval_step({"params": sd["params"], "batch_stats": sd["batch_stats"]}, jb)
        be = np.asarray(jnp.mean(rep["bit_err"], axis=0))
        L = (len(be) - 1) // 2
        print(f"step {i}: loss={m['loss']:.4f} roi={m['loss_roi']:.4f} "
              f"x={m['loss_x']:.4f} y={m['loss_y']:.4f} "
              f"| bit_err roi={be[0]:.3f} "
              f"x=[{' '.join(f'{v:.3f}' for v in be[1:1+L])}] "
              f"y=[{' '.join(f'{v:.3f}' for v in be[1+L:])}] "
              f"({(time.time()-t0)/i:.3f}s/step)", flush=True)
