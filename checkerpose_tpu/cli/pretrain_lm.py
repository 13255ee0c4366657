"""Pretrain the multi-object (LM 13-object) init net.

CLI mirror of the reference `pretrain_lm.py`:
  python -m checkerpose_tpu.cli.pretrain_lm --cfg <cfg.txt>
One shared estimator; per-object keypoints/KNN gathered by obj_idx inside the
jitted step (train/steps.knn_for_batch).
"""
from __future__ import annotations

import argparse

import numpy as np

from checkerpose_tpu.cli import common
from checkerpose_tpu.cli.pretrain import build_init_net
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.loop import run_training
from checkerpose_tpu.train.state import create_init_state, make_optimizer, param_count
from checkerpose_tpu.eval.harness import evaluate_init
from checkerpose_tpu.utils.logging import MetricWriter


def main(cfg):
    p3d_table, p3dn_stack, knn_stack = common.load_keypoints_lm(cfg)
    npoint = p3dn_stack.shape[1]
    net = build_init_net(cfg, npoint)
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    crop_gt = int(cfg.get("BoundingBox_CropSize_GT", 128))

    opt = make_optimizer(float(cfg["learning_rate"]),
                         cfg.get("learning_rate2"), cfg.get("learning_rate2_start"))
    state = create_init_state(net, knn_stack[0], crop_img, opt)
    print(f"#parameters: {param_count(state.params):.2f}M", flush=True)

    ckpt = CheckpointManager(cfg["check_point_path"])
    if cfg.get("load_checkpoint", False) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)

    state = common.maybe_graft_pretrained_backbone(cfg, state)

    train_loader, val_loader_factory = common.build_train_loaders_lm(cfg, p3d_table)
    step = steps.make_pretrain_step(
        net, knn_stack, opt, crop_size_gt=crop_gt,
        mask_loss_type=cfg.get("MaskBit_Loss_Type", "BCE"),
        proj_loss_type=cfg.get("ProjBit_Loss_Type", "BCE"),
        proj_bit_loss_weight=float(cfg.get("proj_bit_loss_weight", 1.0)),
        use_pepper_salt=bool(cfg.get("use_peper_salt", True)),
        use_motion_blur=bool(cfg.get("use_motion_blur", True)),
        color_aug_prob=float(cfg.get("color_aug_prob", 0.8)),
        aux_heatmap_weight=float(cfg.get("aux_heatmap_loss_weight", 0.0)))

    writer = MetricWriter(cfg["tensorboard_path"])

    def eval_fn(variables):
        # per-object sweep, then average over objects (reference
        # test_network_with_test_data.py:667-676 semantics)
        accs = []
        for obj_id in sorted(cfg["obj_ids"]):
            r = evaluate_init(net, knn_stack, variables,
                              val_loader_factory(obj_id), crop_gt,
                              best_score_metric=cfg.get("best_score_metric"))
            accs.append(r["test_acc"])
        return {"test_acc": float(np.mean(accs))}

    state = run_training(
        state=state, step_fns={None: step}, loader=train_loader,
        total_iteration=int(cfg["total_iteration"]), eval_fn=eval_fn,
        ckpt=ckpt, writer=writer,
        log_freq=int(cfg.get("log_freq", 1000)),
        test_freq=int(cfg.get("test_freq", 10000)),
        save_freq=int(cfg.get("save_freq", 0)) or None)
    writer.close()
    return state


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="pretrain LM multi-object init net (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--load_checkpoint", action="store_true")
    p.add_argument("--total_iteration", type=int, default=None)
    p.add_argument("--test_freq", type=int, default=None)
    p.add_argument("--save_freq", type=int, default=None)
    args = p.parse_args()
    cfg = common.resolve_cfg_lm(args.cfg, {
        "load_checkpoint": args.load_checkpoint or None,
        "total_iteration": args.total_iteration,
        "test_freq": args.test_freq,
        "save_freq": args.save_freq,
    })
    main(cfg)
