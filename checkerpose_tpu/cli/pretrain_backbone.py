"""Backbone bootstrap: dense NOCS pretraining on synthetic renders.

  python -m checkerpose_tpu.cli.pretrain_backbone --cfg <cfg.txt> --obj_name ape

The reference fine-tunes an ImageNet-pretrained backbone
(`model/backbone.py:39-50`); this offline image has no pretrained weights,
and round 2-3 measured that the from-scratch backbone's per-image scale/
offset binding is the accuracy bottleneck (ACCURACY.md findings 2 and 5).
This CLI trains the backbone on per-pixel normalized object coordinates
(models/nocs.py) with GT depth rendered from the object mesh, then
`cli.pretrain` / `cli.pretrain_lm` graft the result via cfg key
`backbone_pretrain_checkpoint` (shape-validated, models/convert.py path).

Reuses the standard crop dataset; the depth crop at the GT grid is
RENDERED from the object mesh at the GT pose with crop-adjusted
intrinsics, ON DEVICE inside the jitted train step (ops/raster.py — the
XLA twin of the eval/renderer.py z-buffer VSD uses, golden-tested in
tests/test_raster.py). Rendering beats loading the sensor depth: it is
noise-free, needs no depth images on disk (the reference's train_pbr/
train_real splits vary), and occlusion is already handled by masking the
loss with mask_visib; rendering on device keeps the 1-core host loader
off the critical path (~21 ms/item measured for the host z-buffer).
"""
from __future__ import annotations

import argparse

import jax

from checkerpose_tpu.cli import common
from checkerpose_tpu.data.bop_io import scan_bop_object
from checkerpose_tpu.data.dataset import CropDataset, Loader
from checkerpose_tpu.models.nocs import NOCSNet
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.loop import run_training
from checkerpose_tpu.train.state import TrainState, make_optimizer, param_count
from checkerpose_tpu.utils.logging import MetricWriter


def build_nocs_net(cfg) -> NOCSNet:
    return NOCSNet(
        backbone_name=cfg.get("network_backbone_name", "hrnet_w18"),
        head_width=int(cfg.get("nocs_head_width", 128)))


def create_nocs_state(net: NOCSNet, crop_size_img: int, optimizer):
    import jax.numpy as jnp
    from flax.core import FrozenDict
    img = jnp.zeros((1, crop_size_img, crop_size_img, 3), jnp.float32)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=False)
    params = variables["params"]
    return TrainState(params=params,
                      batch_stats=variables.get("batch_stats", FrozenDict()),
                      opt_state=optimizer.init(params), step=0,
                      best_score=-1.0)


def main(cfg):
    xyz, _, _ = common.load_keypoints(cfg)
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    # the NOCS grid is the head's native stride-4 resolution, NOT the
    # pose-code GT size: labels must match the dense output pixel-for-pixel
    crop_gt = crop_img // 4
    net = build_nocs_net(cfg)
    opt = make_optimizer(float(cfg["learning_rate"]))
    state = create_nocs_state(net, crop_img, opt)
    print(f"#parameters: {param_count(state.params):.2f}M", flush=True)

    ckpt = CheckpointManager(cfg["check_point_path"])
    if cfg.get("load_checkpoint", False) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {state.step}", flush=True)

    from checkerpose_tpu.data.bop_io import model_ply_path
    from checkerpose_tpu.data.ply import load_ply_mesh
    verts, faces = load_ply_mesh(model_ply_path(
        cfg["bop_path"], cfg["dataset_name"], cfg["obj_id"]))
    if faces is None or len(faces) == 0:
        raise ValueError("NOCS pretraining renders GT depth from the mesh; "
                         "the model ply has no faces")
    kw = dict(crop_size_img=crop_img, crop_size_gt=crop_gt,
              padding_ratio=float(cfg.get("padding_ratio", 1.5)),
              resize_method=cfg.get("resize_method", "crop_square_resize"),
              frame_cache=common._frame_cache(cfg))
    vt = float(cfg.get("train_obj_visible_theshold", 0.1))
    samples = scan_bop_object(cfg["bop_path"], cfg["dataset_name"],
                              cfg["training_data_folder"], cfg["obj_id"], vt)
    loader = Loader(CropDataset(samples, xyz, is_train=True, **kw),
                    int(cfg["batch_size"]), shuffle=True, infinite=True)

    diameter = common.object_diameter(cfg)
    step = steps.make_nocs_train_step(
        net, opt, diameter=diameter,
        use_pepper_salt=cfg.get("use_peper_salt", True),
        use_motion_blur=cfg.get("use_motion_blur", True),
        color_aug_prob=float(cfg.get("color_aug_prob", 0.8)),
        mesh=(verts, faces))

    writer = MetricWriter(cfg["tensorboard_path"])

    def eval_fn(variables):
        # gate "best" on the (negated) train loss proxy: NOCS pretraining
        # has no pose metric; downstream quality is judged by cli.pretrain
        return {"test_acc": 0.0}

    state = run_training(
        state=state, step_fns={None: step}, loader=loader,
        total_iteration=int(cfg["total_iteration"]), eval_fn=eval_fn,
        ckpt=ckpt, writer=writer,
        log_freq=int(cfg.get("log_freq", 100)),
        test_freq=int(cfg.get("test_freq", 10 ** 9)),
        save_freq=int(cfg.get("save_freq", 0)) or None)
    writer.close()
    return state


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="dense NOCS backbone pretrain (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--obj_name", required=True)
    p.add_argument("--load_checkpoint", action="store_true")
    p.add_argument("--total_iteration", type=int, default=None)
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    args = p.parse_args()
    cfg = common.resolve_cfg(args.cfg, args.obj_name, {
        "load_checkpoint": args.load_checkpoint or None,
        "total_iteration": args.total_iteration,
        "save_freq": args.save_freq,
        "batch_size": args.batch_size,
    })
    main(cfg)
