"""Offline evaluation + BOP CSV export for one object.

CLI mirror of the reference `test.py` (`test.py:547-590`):
  python -m checkerpose_tpu.cli.test --cfg <cfg.txt> --obj_name ape \
      [--ckpt_dir <dir>] [--use_progressivex] [--eval_output_path out/]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

from checkerpose_tpu.cli import common
from checkerpose_tpu.cli.train import build_pose_net
from checkerpose_tpu.data.bop_io import model_ply_path
from checkerpose_tpu.data.ply import load_ply_vertices
from checkerpose_tpu.eval.csv_writer import write_csv
from checkerpose_tpu.eval.harness import calibrate_decode_tau, evaluate_pipeline
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import create_pose_state, make_optimizer


def main(cfg):
    xyz, normed, knn = common.load_keypoints(cfg)
    npoint = xyz.shape[0]
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    net = build_pose_net(cfg, npoint)
    opt = make_optimizer(1e-4)
    state = create_pose_state(net, knn, crop_img, opt, npoint)

    ckpt_dir = cfg.get("ckpt_dir") or cfg["check_point_path"]
    mgr = CheckpointManager(ckpt_dir)
    # default = best checkpoint (reference test.py gets an explicit iteration
    # via get_checkpoint; our best-gating mirrors its "use the best eval"
    # workflow). use_latest evaluates the newest rolling checkpoint instead —
    # needed when the best-gate metric changed mid-run (e.g. decode_conf_tau
    # retuning) and the recorded best is stale.
    if cfg.get("use_latest"):
        state = mgr.restore_eval(state)
        print(f"loaded LATEST checkpoint (step {state.step}) from {ckpt_dir}")
    else:
        try:
            state = mgr.restore_eval(state, best=True)
            print(f"loaded BEST checkpoint (step {state.step}) from {ckpt_dir}")
        except FileNotFoundError:
            state = mgr.restore_eval(state)
            print(f"loaded latest checkpoint (step {state.step}) from {ckpt_dir}")

    res = 2 ** net.res_log2
    loader, samples = common.build_test_loader(
        cfg, xyz, batch_size=int(cfg.get("test_batch_size", 16)), crop_gt=res)

    # ADD/ADI over eval-model vertices when available, else the keypoints
    try:
        verts = load_ply_vertices(model_ply_path(cfg["bop_path"], cfg["dataset_name"],
                                                 cfg["obj_id"], eval_models=True))
        if len(verts) > 8192:
            verts = verts[np.random.default_rng(0).choice(len(verts), 8192, False)]
    except Exception:
        verts = xyz
    diameter = common.object_diameter(cfg)

    p3dn = normed.astype(np.float32)

    def with_p3d(loader):
        return common.with_p3d(loader, p3dn)

    # CSV-export filter parity (reference test.py:113-119): poses exported
    # to the BOP CSV are UNfiltered except for a hardcoded per-object list
    # that uses the visib-mask filtering.
    use_filter_visib = (
        (cfg["dataset_name"] == "lmo"
         and cfg["obj_name"] in ("can", "cat", "driller", "eggbox"))
        or (cfg["dataset_name"] == "ycbv"
            and cfg["obj_name"] in ("pudding_box", "foam_brick")))
    main_filter = cfg.get("main_filter") or ("visib" if use_filter_visib else "none")

    decode_mode = cfg.get("decode_mode", "hard")
    tau = float(cfg.get("decode_conf_tau", 3.0))
    tau_sweep = None
    if decode_mode == "adaptive" and cfg.get("decode_tau_auto"):
        # no manual tau given: auto-calibrate on a ≤32-image held-out val
        # slice (the optimum is training-state dependent — VERDICT r3 #6)
        factory = common.build_val_slice_loader_factory(cfg, xyz, crop_gt=res)
        tau, tau_sweep = calibrate_decode_tau(
            net, knn, state.variables(),
            lambda: with_p3d(factory()), xyz, diameter,
            stage=net.num_refine_steps, use_adi=cfg.get("is_symmetric", False),
            main_filter=("visib" if main_filter == "none" else main_filter),
            **common.solver_kwargs(cfg))
        print(f"auto-calibrated decode_conf_tau={tau} "
              f"(val-slice adx10 sweep: {tau_sweep})", flush=True)

    report = evaluate_pipeline(
        net, knn, state.variables(), with_p3d(loader), xyz, diameter,
        stage=net.num_refine_steps, use_adi=cfg.get("is_symmetric", False),
        vertices=verts.astype(np.float32),
        **common.solver_kwargs(cfg),
        discard_bd_pixel=int(cfg.get("ignore_bit", 0)),
        main_filter=main_filter,
        decode_mode=decode_mode,
        decode_conf_tau=tau,
        filter_judge_bits=cfg.get("filter_judge_bits"))
    report["decode_mode"] = decode_mode
    if cfg.get("filter_judge_bits") is not None:
        report["filter_judge_bits"] = int(cfg["filter_judge_bits"])
    if decode_mode == "adaptive":
        report["decode_conf_tau"] = tau
        if tau_sweep is not None:
            report["tau_sweep"] = tau_sweep

    out_dir = cfg.get("eval_output_path", "eval_output")
    os.makedirs(out_dir, exist_ok=True)
    tag = f"{cfg['config_file_name']}_{cfg['obj_name']}"
    # score txt (reference test.py:530-537)
    with open(os.path.join(out_dir, f"score_{tag}.txt"), "w") as f:
        for mode in ("none", "full", "visib"):
            if mode in report:
                f.write(f"[{mode}] " + " ".join(
                    f"{k}={v:.4f}" for k, v in report[mode].items()) + "\n")
        f.write(f"seg_acc={report['seg_acc']:.4f} seg_iou={report['seg_iou']:.4f}\n")
        f.write(f"test_acc={report['test_acc']:.4f}\n")
    with open(os.path.join(out_dir, f"report_{tag}.json"), "w") as f:
        json.dump({k: v for k, v in report.items() if k != "poses"}, f, indent=2)
    # BOP19 CSV (reference test.py:539-544)
    poses = report["poses"]
    write_csv(out_dir, tag, cfg["obj_id"],
              [p["scene_id"] for p in poses], [p["im_id"] for p in poses],
              [p["R"] for p in poses], [p["t"] for p in poses],
              [p["score"] for p in poses])
    print(json.dumps({k: v for k, v in report.items() if k != "poses"}, indent=2))
    return report


def parse_args():
    p = argparse.ArgumentParser(description="evaluate pose net + export BOP CSV (TPU)")
    p.add_argument("--cfg", required=True)
    p.add_argument("--obj_name", required=True)
    p.add_argument("--ckpt_dir", default=None)
    p.add_argument("--ckpt_file", default=None,
                   help="reference-CLI alias for --ckpt_dir (test.py:551)")
    p.add_argument("--eval_output_path", default=None)
    p.add_argument("--use_progressivex", action="store_true")
    # solver tuning, reference test.py:554-558
    p.add_argument("--prog_max_iters", type=int, default=None)
    p.add_argument("--cv_max_iters", type=int, default=None)
    p.add_argument("--nbr_ball_radius", type=float, default=None)
    p.add_argument("--spatial_coherence_weight", type=float, default=None)
    p.add_argument("--reprojErr_thresh", type=float, default=None)
    p.add_argument("--ignore_bit", type=int, default=None)
    p.add_argument("--test_batch_size", type=int, default=None)
    p.add_argument("--decode_mode", default=None,
                   choices=("hard", "soft", "adaptive"))
    p.add_argument("--decode_conf_tau", type=float, default=None)
    p.add_argument("--filter_judge_bits", type=int, default=None,
                   help="judge seg/boundary filters at the top-k-bit cell "
                        "center (mitigates the fine-bit filter collapse, "
                        "tools/diag_filter_collapse.py); default = reference "
                        "parity (full-res hard claim)")
    p.add_argument("--use_latest", action="store_true",
                   help="evaluate the latest rolling checkpoint, not best")
    return p.parse_args()


if __name__ == "__main__":
    args = parse_args()
    cfg = common.resolve_cfg(args.cfg, args.obj_name, {
        "ckpt_dir": common.checkpoint_dir_arg(args.ckpt_dir, args.ckpt_file),
        "eval_output_path": args.eval_output_path,
        "use_progressivex": args.use_progressivex or None,
        "prog_max_iters": args.prog_max_iters,
        "cv_max_iters": args.cv_max_iters,
        "nbr_ball_radius": args.nbr_ball_radius,
        "spatial_coherence_weight": args.spatial_coherence_weight,
        "reprojErr_thresh": args.reprojErr_thresh,
        "ignore_bit": args.ignore_bit,
        "test_batch_size": args.test_batch_size,
        "decode_mode": args.decode_mode,
        "decode_conf_tau": args.decode_conf_tau,
        "filter_judge_bits": args.filter_judge_bits,
        # --decode_mode adaptive WITHOUT --decode_conf_tau => calibrate tau
        # automatically on a val slice (VERDICT r3 #6: no manual sweep)
        "decode_tau_auto": (args.decode_mode == "adaptive"
                            and args.decode_conf_tau is None) or None,
        "use_latest": args.use_latest or None,
    })
    main(cfg)
