"""Final accuracy report for the synthetic proof run.

Runs the full test split through evaluate_pipeline under several decode
settings (reference-parity hard decode + adaptive taus) and writes a markdown
table + JSON. Run on the real TPU after training finishes:

    python tools/final_report.py [--best] [--out experiments/final_report]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("CHECKERPOSE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["CHECKERPOSE_PLATFORM"])
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from checkerpose_tpu.cli import common
from checkerpose_tpu.cli.train import build_pose_net
from checkerpose_tpu.eval.harness import evaluate_pipeline
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import create_pose_state, make_optimizer

SETTINGS = [
    ("hard (reference parity)", "hard", 0.0),
    ("adaptive tau=3", "adaptive", 3.0),
    ("adaptive tau=5", "adaptive", 5.0),
    ("adaptive tau=6", "adaptive", 6.0),
]


def main(cfg, best=False, out_dir="experiments/final_report"):
    xyz, normed, knn = common.load_keypoints(cfg)
    npoint = xyz.shape[0]
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    net = build_pose_net(cfg, npoint)
    state = create_pose_state(net, knn, crop_img, make_optimizer(1e-4), npoint)
    mgr = CheckpointManager(cfg["check_point_path"])
    try:
        state = mgr.restore_eval(state, best=best)
    except FileNotFoundError:
        state = mgr.restore_eval(state)
    print(f"checkpoint step {state.step} (best={best})")

    res = 2 ** net.res_log2
    diameter = common.object_diameter(cfg)
    p3dn = normed.astype(np.float32)
    rows = []
    for label, mode, tau in SETTINGS:
        loader, _ = common.build_test_loader(
            cfg, xyz, batch_size=int(cfg.get("test_batch_size", 16)),
            crop_gt=res)
        rep = evaluate_pipeline(
            net, knn, state.variables(), common.with_p3d(loader, p3dn), xyz,
            diameter, stage=net.num_refine_steps,
            use_adi=bool(cfg.get("is_symmetric", False)),
            filter_modes=("visib",), main_filter="visib",
            decode_mode=mode, decode_conf_tau=tau)
        v = rep["visib"]
        rows.append({
            "label": label, "decode_mode": mode, "tau": tau,
            "n_images": rep["n_images"],
            "adx02": v["adx02"], "adx05": v["adx05"], "adx10": v["adx10"],
            "auc_posecnn": v["auc_posecnn"],
            "mean_re_deg": v["mean_re_deg"], "mean_te_mm": v["mean_te_mm"],
            "seg_acc": rep["seg_acc"], "seg_iou": rep["seg_iou"],
            "bit_err": rep.get("bit_err"),
        })
        print(f"{label:<26} adx02={v['adx02']:.4f} adx05={v['adx05']:.4f} "
              f"adx10={v['adx10']:.4f} auc={v['auc_posecnn']:.4f} "
              f"re={v['mean_re_deg']:.2f}deg te={v['mean_te_mm']:.2f}mm")

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "final_report.json"), "w") as f:
        json.dump({"step": state.step, "best": best, "diameter": diameter,
                   "rows": rows}, f, indent=2)
    with open(os.path.join(out_dir, "final_report.md"), "w") as f:
        f.write(f"## Synth proof final eval (checkpoint step {state.step}, "
                f"{rows[0]['n_images']} test images, d={diameter:.1f}mm)\n\n")
        f.write("| decode | ADD@0.02d | ADD@0.05d | ADD@0.1d | AUC | re (deg) "
                "| te (mm) | seg IoU |\n|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            f.write(f"| {r['label']} | {r['adx02']:.4f} | {r['adx05']:.4f} | "
                    f"{r['adx10']:.4f} | {r['auc_posecnn']:.4f} | "
                    f"{r['mean_re_deg']:.2f} | {r['mean_te_mm']:.2f} | "
                    f"{r['seg_iou']:.4f} |\n")
    print(f"wrote {out_dir}/final_report.{{json,md}}")
    return rows


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--cfg", default="config/synth/hr18GNN2_res6_gnn3Skip_mlpQuery_synth.txt")
    p.add_argument("--obj_name", default="obj01")
    p.add_argument("--best", action="store_true")
    p.add_argument("--out", default="experiments/final_report")
    a = p.parse_args()
    cfg = common.resolve_cfg(a.cfg, a.obj_name, {})
    main(cfg, best=a.best, out_dir=a.out)
