"""Score a BOP19 result CSV against BOP ground truth (MSSD/MSPD AR).

Standalone equivalent of the reference's downstream scoring flow
(`bop_toolkit/scripts/check_results_bop19.py` + `eval_bop19_pose.py` ->
`eval_calc_errors.py` -> `eval_calc_scores.py`), minus VSD (the only metric
requiring a depth renderer). Runs the error computation batched on device.

  python -m checkerpose_tpu.cli.eval_bop --csv result.csv \
      --bop_path <bop> --dataset lmo [--split test]
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.data.bop_io import (load_models_info, model_ply_path,
                                         scan_bop_object)
from checkerpose_tpu.data.ply import load_ply_vertices
from checkerpose_tpu.eval import bop_scores as B


def main(csv_path: str, bop_path: str, dataset: str, split: str = "test",
         max_verts: int = 4096):
    problems = B.check_bop_results_csv(csv_path)
    if problems:
        print("CSV format problems:", problems[:10])
        return None
    rows = B.load_bop_results_csv(csv_path)
    by_obj = defaultdict(list)
    for r in rows:
        by_obj[r["obj_id"]].append(r)

    minfo = load_models_info(bop_path, dataset, eval_models=True)
    per_obj = {}
    for obj_id, ests in sorted(by_obj.items()):
        gt_samples = scan_bop_object(bop_path, dataset, split, obj_id,
                                     visib_threshold=-1.0)
        gt_map = {(s.scene_id, s.im_id): s for s in gt_samples}
        verts = load_ply_vertices(model_ply_path(bop_path, dataset, obj_id,
                                                 eval_models=True))
        if len(verts) > max_verts:
            verts = verts[np.random.default_rng(0).choice(len(verts), max_verts,
                                                          replace=False)]
        sym_R, sym_t = B.sym_arrays(minfo[obj_id])

        Re, te, Rg, tg, Ks = [], [], [], [], []
        n_missing_gt = 0
        matched_keys = set()
        for r in ests:
            gt = gt_map.get((r["scene_id"], r["im_id"]))
            if gt is None:
                n_missing_gt += 1
                continue
            matched_keys.add((r["scene_id"], r["im_id"]))
            Re.append(r["R"]); te.append(r["t"])
            Rg.append(gt.R); tg.append(gt.t); Ks.append(gt.cam_K)
        if not Re:
            continue
        errs = B.batched_bop_errors(
            jnp.asarray(np.stack(Re), jnp.float32), jnp.asarray(np.stack(te), jnp.float32),
            jnp.asarray(np.stack(Rg), jnp.float32), jnp.asarray(np.stack(tg), jnp.float32),
            jnp.asarray(np.stack(Ks), jnp.float32), jnp.asarray(verts, jnp.float32),
            jnp.asarray(sym_R), jnp.asarray(sym_t))
        mssd_e = np.asarray(errs["mssd"], np.float64)
        mspd_e = np.asarray(errs["mspd"], np.float64)
        # GT instances with no estimate count as misses (inf error)
        n_unmatched = len(gt_map) - len(matched_keys)
        if n_unmatched > 0:
            mssd_e = np.concatenate([mssd_e, np.full(n_unmatched, np.inf)])
            mspd_e = np.concatenate([mspd_e, np.full(n_unmatched, np.inf)])
        rec = B.bop19_average_recall(mssd_e, mspd_e,
                                     float(minfo[obj_id]["diameter"]))
        rec["n_estimates"] = len(ests)
        rec["n_gt"] = len(gt_map)
        per_obj[obj_id] = rec

    overall = {k: float(np.mean([v[k] for v in per_obj.values()]))
               for k in ("ar_mssd", "ar_mspd", "ar")}
    report = {"per_object": per_obj, "overall": overall}
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--bop_path", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="test")
    a = p.parse_args()
    main(a.csv, a.bop_path, a.dataset, a.split)
