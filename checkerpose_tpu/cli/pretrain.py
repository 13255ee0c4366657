"""Pretrain the init localization network on one object.

CLI mirror of the reference `pretrain.py` (`pretrain.py:312-342`):
  python -m checkerpose_tpu.cli.pretrain --cfg <cfg.txt> --obj_name ape
"""
from __future__ import annotations

import argparse

import numpy as np

from checkerpose_tpu.cli import common
from checkerpose_tpu.models import InitNet
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.loop import run_training
from checkerpose_tpu.train.state import create_init_state, make_optimizer, param_count
from checkerpose_tpu.eval.harness import evaluate_init
from checkerpose_tpu.utils.logging import MetricWriter


def build_init_net(cfg, npoint: int) -> InitNet:
    return InitNet(
        npoint=npoint,
        res_log2=int(cfg.get("network_res_log2", 3)),
        backbone_name=cfg.get("network_backbone_name",
                              cfg.get("init_network_backbone_name", "resnet34")),
        num_conv1x1=int(cfg.get("network_num_conv1x1", 1)),
        num_graph_module=int(cfg.get("network_num_graph_module", 2)),
        graph_leaky_slope=float(cfg.get("network_graph_leaky_slope", 0.2)),
    )


def main(cfg):
    xyz, normed, knn = common.load_keypoints(cfg)
    npoint = xyz.shape[0]
    net = build_init_net(cfg, npoint)
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    crop_gt = int(cfg.get("BoundingBox_CropSize_GT", 128))

    opt = make_optimizer(float(cfg["learning_rate"]))
    state = create_init_state(net, knn, crop_img, opt)
    print(f"#parameters: {param_count(state.params):.2f}M", flush=True)

    ckpt = CheckpointManager(cfg["check_point_path"])
    if cfg.get("load_checkpoint", False) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {state.step}", flush=True)

    state = common.maybe_graft_pretrained_backbone(cfg, state)

    train_loader, val_loader_factory = common.build_train_loaders(cfg, xyz)
    step = steps.make_pretrain_step(
        net, knn, opt, crop_size_gt=crop_gt,
        mask_loss_type=cfg.get("MaskBit_Loss_Type", "BCE"),
        proj_loss_type=cfg.get("ProjBit_Loss_Type", "BCE"),
        proj_bit_loss_weight=float(cfg.get("proj_bit_loss_weight", 1.0)),
        use_pepper_salt=bool(cfg.get("use_peper_salt", True)),
        use_motion_blur=bool(cfg.get("use_motion_blur", True)),
        color_aug_prob=float(cfg.get("color_aug_prob", 0.8)),
        aux_heatmap_weight=float(cfg.get("aux_heatmap_loss_weight", 0.0)))

    writer = MetricWriter(cfg["tensorboard_path"])

    def eval_fn(variables):
        rep = evaluate_init(net, knn, variables, val_loader_factory(), crop_gt,
                            best_score_metric=cfg.get("best_score_metric"))
        be = rep.get("bit_err")
        if be is not None:
            # raw per-bit errors (roi, x MSB->LSB, y MSB->LSB) -- acc_x/acc_y
            # above are confidence-WEIGHTED reproj accuracies and can sit at
            # ~0.85 while raw bits are near chance; this line shows the truth
            L = (len(be) - 1) // 2
            print("  bit_err roi={:.3f} x=[{}] y=[{}]".format(
                be[0], " ".join(f"{v:.3f}" for v in be[1:1 + L]),
                " ".join(f"{v:.3f}" for v in be[1 + L:])), flush=True)
        return rep

    state = run_training(
        state=state, step_fns={None: step}, loader=train_loader,
        total_iteration=int(cfg["total_iteration"]), eval_fn=eval_fn,
        ckpt=ckpt, writer=writer,
        log_freq=int(cfg.get("log_freq", 100)),
        test_freq=int(cfg.get("test_freq", 1000)),
        save_freq=int(cfg.get("save_freq", 0)) or None)
    writer.close()
    return state


def parse_args():
    p = argparse.ArgumentParser(description="pretrain init net (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--obj_name", required=True)
    p.add_argument("--load_checkpoint", action="store_true")
    p.add_argument("--total_iteration", type=int, default=None)
    p.add_argument("--test_freq", type=int, default=None)
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    return p.parse_args()


if __name__ == "__main__":
    args = parse_args()
    cfg = common.resolve_cfg(args.cfg, args.obj_name, {
        "load_checkpoint": args.load_checkpoint or None,
        "total_iteration": args.total_iteration,
        "test_freq": args.test_freq,
        "save_freq": args.save_freq,
        "batch_size": args.batch_size,
    })
    main(cfg)
