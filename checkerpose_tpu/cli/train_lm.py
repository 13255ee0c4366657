"""Train the full progressive network across the 13 LM objects.

CLI mirror of the reference `train_lm.py`:
  python -m checkerpose_tpu.cli.train_lm --cfg <cfg.txt>
Two-phase LR (learning_rate -> learning_rate2 at learning_rate2_start) and
per-object validation averaging included. `network_type =
vanilla_GNNskip_ABwoProg` selects the no-progressive-localization ablation.
"""
from __future__ import annotations

import argparse

import numpy as np

from checkerpose_tpu.cli import common
from checkerpose_tpu.config import stage_start_steps, get_train_stage
from checkerpose_tpu.models import PoseNet
from checkerpose_tpu.models.ablation import PoseNetWoProg
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.loop import run_training
from checkerpose_tpu.train.state import create_pose_state, make_optimizer, param_count
from checkerpose_tpu.eval.harness import evaluate_pipeline
from checkerpose_tpu.utils.logging import MetricWriter


def build_pose_net_lm(cfg, npoint: int):
    kw = dict(
        npoint=npoint,
        res_log2=int(cfg.get("network_res_log2", 6)),
        backbone_name=cfg.get("init_network_backbone_name", "resnet34"),
        leaky_slope=float(cfg.get("network_leaky_slope", 0.01)),
        num_graph_module=int(cfg.get("network_num_graph_module", 2)),
        graph_leaky_slope=float(cfg.get("network_graph_leaky_slope", 0.2)),
        init_num_conv1x1=int(cfg.get("init_network_num_conv1x1", 1)),
        init_num_graph_module=int(cfg.get("init_network_num_graph_module", 2)),
        init_graph_leaky_slope=float(cfg.get("init_network_graph_leaky_slope", 0.2)),
    )
    if cfg.get("network_type", "vanilla_GNNskip") == "vanilla_GNNskip_ABwoProg":
        return PoseNetWoProg(**kw), True
    return PoseNet(
        local_k=int(cfg.get("network_local_k", 2)),
        aux_refine_heads=float(cfg.get("aux_refine_heatmap_weight", 0.0)) > 0,
        **kw), False


def main(cfg):
    p3d_table, p3dn_stack, knn_stack = common.load_keypoints_lm(cfg)
    npoint = p3dn_stack.shape[1]
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    net, full_bits = build_pose_net_lm(cfg, npoint)

    opt = make_optimizer(float(cfg["learning_rate"]),
                         cfg.get("learning_rate2"), cfg.get("learning_rate2_start"))
    from checkerpose_tpu.cli.train import load_pretrained_init
    init_bundle = load_pretrained_init(cfg, knn_stack[0], crop_img)
    state = create_pose_state(net, knn_stack[0], crop_img, opt, npoint,
                              init_params=init_bundle)
    print(f"#parameters: {param_count(state.params):.2f}M", flush=True)

    ckpt = CheckpointManager(cfg["check_point_path"])
    if cfg.get("load_checkpoint", False) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)

    train_loader, val_loader_factory = common.build_train_loaders_lm(cfg, p3d_table)
    starts = stage_start_steps(cfg) or tuple([0] * net.num_refine_steps)
    if starts and starts[0] > 0:
        print(f"WARNING: stage_start_steps {starts} begins >0; steps before "
              f"{starts[0]} run at stage 1, not 0 (the seg head needs one "
              "UpBlock; the reference's seg conv has the same constraint)",
              flush=True)

    tf_base = 0.0 if full_bits else float(cfg.get("refine_teacher_force_prob", 0.0))
    tf_prob = steps.teacher_force_prob_at(
        int(state.step), tf_base,
        int(cfg.get("refine_teacher_force_anneal_start", 0)),
        int(cfg.get("refine_teacher_force_anneal_end", 0)))
    if tf_prob != tf_base:
        print(f"teacher forcing annealed {tf_base} -> {tf_prob:.3f} "
              f"(resume step {int(state.step)})", flush=True)

    prefix_mask = ((not full_bits)
                   and bool(cfg.get("prefix_correct_finebit_mask", False))
                   and int(state.step) >= int(cfg.get("prefix_correct_start_step", 0)))
    if prefix_mask:
        print(f"prefix-correct fine-bit masking ON (resume step {int(state.step)})",
              flush=True)

    step_fns = {}
    for stage in range(1, net.num_refine_steps + 1):
        bw = steps.finebit_bit_weights(
            cfg, int(state.step),
            net.res_log2 if full_bits else 3 + stage)
        if bw is not None and stage == net.num_refine_steps:
            print(f"fine-bit loss boost active: weights {bw}", flush=True)
        step_fns[stage] = steps.make_train_step(
            net, knn_stack, opt, stage=stage,
            bit_weights=bw, prefix_correct_mask=prefix_mask,
            roi_loss_type=cfg.get("RoiBit_Loss_Type", "BCE"),
            proj_loss_type=cfg.get("ProjBit_Loss_Type", "BCE"),
            seg_visib_loss_weight=float(cfg.get("seg_visib_loss_weight", 1.0)),
            seg_full_loss_weight=float(cfg.get("seg_full_loss_weight", 1.0)),
            use_pepper_salt=bool(cfg.get("use_peper_salt", True)),
            use_motion_blur=bool(cfg.get("use_motion_blur", True)),
            full_bits=full_bits,
            color_aug_prob=float(cfg.get("color_aug_prob", 0.8)),
            aux_heatmap_weight=float(cfg.get("aux_heatmap_loss_weight", 0.0)),
            aux_refine_weight=(0.0 if full_bits else
                               float(cfg.get("aux_refine_heatmap_weight", 0.0))),
            teacher_force_prob=tf_prob,
            coord_reg_weight=float(cfg.get("coord_reg_loss_weight", 0.0)))

    writer = MetricWriter(cfg["tensorboard_path"])
    sorted_ids = sorted(cfg["obj_ids"])
    id_to_name = {oid: n for n, oid in zip(cfg["obj_names"], cfg["obj_ids"])}
    from checkerpose_tpu.data.bop_io import load_models_info
    minfo = load_models_info(cfg["bop_path"], cfg["dataset_name"])

    def extra_batch(batch):
        return common.attach_p3d(batch, p3dn_stack)

    def with_p3d(loader):
        return common.with_p3d(loader, p3dn_stack)

    def eval_fn(variables):
        accs = {}
        bit_means = []
        bit_vecs = []
        for obj_id in sorted_ids:
            name = id_to_name[obj_id]
            r = evaluate_pipeline(
                net, knn_stack, variables, with_p3d(val_loader_factory(obj_id)),
                p3d_table[obj_id], float(minfo[obj_id]["diameter"]),
                stage=net.num_refine_steps,
                use_adi=(name in cfg["symmetric_names"]),
                filter_modes=("visib",), main_filter="visib",
                decode_mode=cfg.get("decode_mode", "hard"),
                decode_conf_tau=float(cfg.get("decode_conf_tau", 3.0)))
            accs[name] = r["test_acc"]
            if "bit_err" in r:
                bit_means.append(float(np.mean(r["bit_err"])))
                bit_vecs.append(r["bit_err"])
        mean = float(np.mean(list(accs.values())))
        print("per-object adx10:", {k: round(v, 4) for k, v in accs.items()})
        if bit_vecs:
            # object-averaged per-bit errors (roi, x MSB->LSB, y MSB->LSB):
            # the live view of which progressive bits have cracked (same
            # format as cli.train's eval print)
            bv = np.mean(np.asarray(bit_vecs), axis=0)
            L = (len(bv) - 1) // 2
            print("  bit_err roi={:.3f} x=[{}] y=[{}]".format(
                bv[0], " ".join(f"{v:.3f}" for v in bv[1:1 + L]),
                " ".join(f"{v:.3f}" for v in bv[1 + L:])), flush=True)
        ev = {"test_acc": mean}
        if len(bit_means) == len(sorted_ids):
            # decode-invariant gate, as in cli.train: mean per-bit accuracy
            # across all objects (tau-sensitive adx10 must not gate the best
            # checkpoint — r3 stale-gate bug)
            ev["gate_score"] = 1.0 - float(np.mean(bit_means))
            ev["gate_metric"] = "one_minus_mean_bit_err"
        return ev

    state = run_training(
        state=state, step_fns=step_fns, loader=train_loader,
        total_iteration=int(cfg["total_iteration"]), eval_fn=eval_fn,
        ckpt=ckpt, writer=writer,
        log_freq=int(cfg.get("log_freq", 1000)),
        test_freq=int(cfg.get("test_freq", 10000)),
        save_freq=int(cfg.get("save_freq", 0)) or None,
        get_stage=lambda s: max(1, get_train_stage(s, starts)),
        extra_batch=extra_batch)
    writer.close()
    return state


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="train LM 13-object pose net (TPU)")
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
