"""Train the full progressive pose network on one object.

CLI mirror of the reference `train.py` (`train.py:381-411`):
  python -m checkerpose_tpu.cli.train --cfg <cfg.txt> --obj_name ape
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from checkerpose_tpu.cli import common
from checkerpose_tpu.config import stage_start_steps, get_train_stage
from checkerpose_tpu.models import InitNet, PoseNet
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.loop import run_training
from checkerpose_tpu.train.state import (create_init_state, create_pose_state,
                                         make_optimizer, param_count)
from checkerpose_tpu.eval.harness import evaluate_pipeline
from checkerpose_tpu.utils.logging import MetricWriter


def build_pose_net(cfg, npoint: int) -> PoseNet:
    return PoseNet(
        npoint=npoint,
        aux_refine_heads=float(cfg.get("aux_refine_heatmap_weight", 0.0)) > 0,
        res_log2=int(cfg.get("network_res_log2", 6)),
        backbone_name=cfg.get("init_network_backbone_name", "resnet34"),
        local_k=int(cfg.get("network_local_k", 2)),
        leaky_slope=float(cfg.get("network_leaky_slope", 0.01)),
        num_graph_module=int(cfg.get("network_num_graph_module", 2)),
        graph_leaky_slope=float(cfg.get("network_graph_leaky_slope", 0.2)),
        init_num_conv1x1=int(cfg.get("init_network_num_conv1x1", 1)),
        init_num_graph_module=int(cfg.get("init_network_num_graph_module", 2)),
        init_graph_leaky_slope=float(cfg.get("init_network_graph_leaky_slope", 0.2)),
    )


def load_pretrained_init(cfg, knn, crop_img: int):
    """Load the LATEST pretrained InitNet params from init_pretrained_root
    (reference `train.py:213-215` grafts `get_checkpoint` = the max-numbered
    checkpoint, not the best-scoring one); falls back to the best checkpoint
    when only a `best/` dir survives."""
    root = cfg.get("init_pretrained_root")
    if not root:
        return None
    # single-object runs nest checkpoints under the object name; the LM
    # multi-object path uses the shared "lm13" leaf (cli.common.resolve_cfg_lm)
    ckpt_dir = os.path.join(root, cfg.get("obj_name", "lm13"))
    if not os.path.isdir(ckpt_dir):
        print(f"init_pretrained_root {ckpt_dir} missing; training from scratch")
        return None
    init_net = InitNet(
        npoint=2 ** int(cfg["num_p3d_log2"]),
        res_log2=3,
        backbone_name=cfg.get("init_network_backbone_name", "resnet34"),
        num_graph_module=int(cfg.get("init_network_num_graph_module", 2)),
        graph_leaky_slope=float(cfg.get("init_network_graph_leaky_slope", 0.2)))
    opt = make_optimizer(1e-4)
    st = create_init_state(init_net, knn, crop_img, opt)
    mgr = CheckpointManager(ckpt_dir)
    try:
        st = mgr.restore_eval(st)
    except FileNotFoundError:
        try:
            st = mgr.restore_eval(st, best=True)
        except FileNotFoundError:
            print(f"no init checkpoint under {ckpt_dir}; training from scratch")
            return None
    print(f"loaded pretrained init net from {ckpt_dir} (step {st.step})")
    return {"params": st.params, "batch_stats": st.batch_stats}


def main(cfg):
    xyz, normed, knn = common.load_keypoints(cfg)
    npoint = xyz.shape[0]
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    net = build_pose_net(cfg, npoint)

    opt = make_optimizer(float(cfg["learning_rate"]),
                         cfg.get("learning_rate2"),
                         cfg.get("learning_rate2_start"))
    init_bundle = load_pretrained_init(cfg, knn, crop_img)
    state = create_pose_state(net, knn, crop_img, opt, npoint,
                              init_params=init_bundle)
    print(f"#parameters: {param_count(state.params):.2f}M", flush=True)

    ckpt = CheckpointManager(cfg["check_point_path"])
    if cfg.get("load_checkpoint", False) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"resumed from step {state.step}", flush=True)

    train_loader, val_loader_factory = common.build_train_loaders(cfg, xyz)
    starts = stage_start_steps(cfg) or tuple([0] * net.num_refine_steps)
    if starts and starts[0] > 0:
        print(f"WARNING: stage_start_steps {starts} begins >0; steps before "
              f"{starts[0]} run at stage 1, not 0 (the seg head needs one "
              "UpBlock; the reference's seg conv has the same constraint)",
              flush=True)

    tf_base = float(cfg.get("refine_teacher_force_prob", 0.0))
    tf_prob = steps.teacher_force_prob_at(
        int(state.step), tf_base,
        int(cfg.get("refine_teacher_force_anneal_start", 0)),
        int(cfg.get("refine_teacher_force_anneal_end", 0)))
    if tf_prob != tf_base:
        print(f"teacher forcing annealed {tf_base} -> {tf_prob:.3f} "
              f"(resume step {int(state.step)})", flush=True)

    prefix_mask = (bool(cfg.get("prefix_correct_finebit_mask", False))
                   and int(state.step) >= int(cfg.get("prefix_correct_start_step", 0)))
    if prefix_mask:
        print(f"prefix-correct fine-bit masking ON (resume step {int(state.step)})",
              flush=True)

    step_fns = {}
    for stage in range(1, net.num_refine_steps + 1):
        bw = steps.finebit_bit_weights(cfg, int(state.step), 3 + stage)
        if bw is not None and stage == net.num_refine_steps:
            print(f"fine-bit loss boost active: weights {bw}", flush=True)
        step_fns[stage] = steps.make_train_step(
            net, knn, opt, stage=stage,
            bit_weights=bw, prefix_correct_mask=prefix_mask,
            roi_loss_type=cfg.get("RoiBit_Loss_Type", "BCE"),
            proj_loss_type=cfg.get("ProjBit_Loss_Type", "BCE"),
            seg_visib_loss_weight=float(cfg.get("seg_visib_loss_weight", 1.0)),
            seg_full_loss_weight=float(cfg.get("seg_full_loss_weight", 1.0)),
            use_pepper_salt=bool(cfg.get("use_peper_salt", True)),
            use_motion_blur=bool(cfg.get("use_motion_blur", True)),
            color_aug_prob=float(cfg.get("color_aug_prob", 0.8)),
            aux_heatmap_weight=float(cfg.get("aux_heatmap_loss_weight", 0.0)),
            aux_refine_weight=float(cfg.get("aux_refine_heatmap_weight", 0.0)),
            teacher_force_prob=tf_prob,
            coord_reg_weight=float(cfg.get("coord_reg_loss_weight", 0.0)))

    writer = MetricWriter(cfg["tensorboard_path"])
    diameter = common.object_diameter(cfg)
    p3dn = normed.astype(np.float32)

    def extra_batch(batch):
        return common.attach_p3d(batch, p3dn)

    def eval_fn(variables):
        rep = evaluate_pipeline(
            net, knn, variables, common.with_p3d(val_loader_factory(), p3dn), xyz,
            diameter, stage=net.num_refine_steps,
            use_adi=cfg.get("is_symmetric", False),
            filter_modes=("visib",), main_filter="visib",
            decode_mode=cfg.get("decode_mode", "hard"),
            decode_conf_tau=float(cfg.get("decode_conf_tau", 3.0)))
        if "bit_err" in rep:
            # per-bit code errors (roi, x MSB->LSB, y MSB->LSB): the live
            # view of which progressive bits have cracked
            be = rep["bit_err"]
            L = (len(be) - 1) // 2
            print("  bit_err roi={:.3f} x=[{}] y=[{}]".format(
                be[0], " ".join(f"{v:.3f}" for v in be[1:1 + L]),
                " ".join(f"{v:.3f}" for v in be[1 + L:])), flush=True)
            # best-checkpoint gate: DECODE-INVARIANT mean per-bit accuracy.
            # The adx10 under cfg's decode_mode is tau-sensitive (retuning
            # tau mid-run froze the r3 best ckpt at a stale record); per-bit
            # error depends only on the hard predictions vs GT labels.
            rep["gate_score"] = 1.0 - float(np.mean(rep["bit_err"]))
            rep["gate_metric"] = "one_minus_mean_bit_err"
        return rep

    state = run_training(
        state=state, step_fns=step_fns, loader=train_loader,
        total_iteration=int(cfg["total_iteration"]), eval_fn=eval_fn,
        ckpt=ckpt, writer=writer,
        log_freq=int(cfg.get("log_freq", 100)),
        test_freq=int(cfg.get("test_freq", 1000)),
        save_freq=int(cfg.get("save_freq", 0)) or None,
        get_stage=lambda s: max(1, get_train_stage(s, starts)),
        extra_batch=extra_batch)
    writer.close()
    return state



def parse_args():
    p = argparse.ArgumentParser(description="train full pose net (TPU)")
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
