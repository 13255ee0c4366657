"""Export/import params+batch_stats of an orbax checkpoint as one .npz.

The full rolling checkpoint (params + Adam state) is ~350 MB and lives in
`experiments/` which VM restarts have wiped twice this round; a params-only
.npz (~90 MB) checked into the repo lets the next round warm-start training
(fresh optimizer state) or run evaluation without re-training from scratch.

Usage:
  python tools/export_params.py export --cfg <cfg.txt> --obj_name objN --out w.npz
  python tools/export_params.py import --cfg <cfg.txt> --obj_name objN --npz w.npz
      (writes a step-tagged orbax checkpoint the CLIs can resume from)
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CHECKERPOSE_PLATFORM", "cpu")


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1], np.asarray(tree)


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        node = tree
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def _state_for(cfg):
    from checkerpose_tpu.cli import common
    from checkerpose_tpu.cli.train import build_pose_net
    from checkerpose_tpu.train.state import create_pose_state, make_optimizer

    p3d, p3dn, knn = common.load_keypoints(cfg)
    net = build_pose_net(cfg, p3dn.shape[0])
    opt = make_optimizer(float(cfg["learning_rate"]),
                         cfg.get("learning_rate2"),
                         cfg.get("learning_rate2_start"))
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    return create_pose_state(net, knn, crop_img, opt, p3dn.shape[0]), knn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["export", "import"])
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--obj_name", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--npz", default=None)
    ap.add_argument("--best", action="store_true")
    args = ap.parse_args()

    from checkerpose_tpu.cli.common import resolve_cfg
    from checkerpose_tpu.train.checkpoint import CheckpointManager

    cfg = resolve_cfg(args.cfg, args.obj_name)
    state, _ = _state_for(cfg)
    mgr = CheckpointManager(cfg["check_point_path"])

    if args.mode == "export":
        state = mgr.restore_eval(state, best=args.best)
        flat = dict(_flatten({"params": state.params,
                              "batch_stats": state.batch_stats}))
        flat["__step__"] = np.asarray(state.step)
        out = args.out or f"{args.obj_name}_params.npz"
        np.savez_compressed(out, **flat)
        print(f"exported step {int(state.step)} -> {out} "
              f"({os.path.getsize(out)/1e6:.1f} MB, {len(flat)-1} leaves)")
    else:
        data = np.load(args.npz)
        step = int(data["__step__"])
        flat = {k: data[k] for k in data.files if k != "__step__"}
        tree = _unflatten(flat)
        import jax
        state = state.replace(
            params=jax.tree.map(lambda o, n: np.asarray(n, o.dtype),
                                state.params, tree["params"]),
            batch_stats=jax.tree.map(lambda o, n: np.asarray(n, o.dtype),
                                     state.batch_stats, tree["batch_stats"]),
            step=step)
        mgr.save(state)
        mgr.wait()
        print(f"imported {args.npz} -> orbax step {step} under "
              f"{cfg['check_point_path']}")


if __name__ == "__main__":
    main()
