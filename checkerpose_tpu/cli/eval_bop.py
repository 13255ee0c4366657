"""Score a BOP19 result CSV against BOP ground truth (MSSD/MSPD AR).

Standalone equivalent of the reference's downstream scoring flow
(`bop_toolkit/scripts/check_results_bop19.py` + `eval_bop19_pose.py` ->
`eval_calc_errors.py` -> `eval_calc_scores.py`), including VSD when test
depth images + mesh faces are on disk (depth rendering via eval/renderer.py
instead of the C++ bop_renderer). MSSD/MSPD run batched on device.

  python -m checkerpose_tpu.cli.eval_bop --csv result.csv \
      --bop_path <bop> --dataset lmo [--split test]
"""
from __future__ import annotations

import argparse
import json
from collections import defaultdict

import numpy as np

from checkerpose_tpu.cli import common as _common  # noqa: F401  (sets the
# persistent compile cache + platform override, CLAUDE.md env rule 5)
import jax.numpy as jnp

from checkerpose_tpu.data.bop_io import (load_models_info, model_ply_path,
                                         scan_bop_object)
from checkerpose_tpu.data.ply import load_ply_vertices
from checkerpose_tpu.eval import bop_scores as B


def _eval_images(gt_by_im, targets_ntop, obj_id):
    """(scene, im) keys to evaluate: ONLY the targeted images when a BOP19
    targets file exists (official eval_calc_scores.py walks targets_org, so
    untargeted test images must not enter the recall denominator), else all
    images with GT."""
    if targets_ntop:
        return [k for k in gt_by_im if (k[0], k[1], obj_id) in targets_ntop]
    return list(gt_by_im)


def _gt_valid_official(gts, key, targets_ntop, obj_id):
    """Per-GT validity. BOP19 (visib_gt_min = -1): the inst_count most-
    visible GT instances are valid (eval_calc_scores.py:228-238); without a
    targets file fall back to the visib_fract > 0.1 rule."""
    if not targets_ntop:
        return [s.visib_fract > 0.1 for s in gts]
    n = int(targets_ntop.get((key[0], key[1], obj_id), 0))
    order = sorted(range(len(gts)), key=lambda i: gts[i].visib_fract,
                   reverse=True)
    valid = [False] * len(gts)
    for i in order[:max(n, 0)]:
        valid[i] = True
    return valid


def _try_vsd(ests, gt_by_im, targets_ntop, obj_id, bop_path, dataset,
             minfo):
    """AR_VSD with official matching when test depth images + mesh faces are
    available; returns None otherwise. AR averages recall over the (tau, th)
    grid (taus 0.05..0.5 * diameter, th 0.05..0.5), delta=15mm (bop19)."""
    import cv2
    from checkerpose_tpu.data.ply import load_ply_mesh
    try:
        verts, faces = load_ply_mesh(model_ply_path(bop_path, dataset, obj_id,
                                                    eval_models=True))
    except Exception:
        return None
    if len(faces) == 0:
        return None
    diameter = float(minfo[obj_id]["diameter"])

    # per-pair per-tau errors, grouped per image; rendered distance maps are
    # cached per POSE (est poses render once per image, GT poses once) --
    # an image with E estimates x G GTs needs E+G renders, not 2*E*G
    depth_cache = {}
    render_cache = {}
    ests_by_im = defaultdict(list)
    for ei, r in enumerate(ests):
        ests_by_im[(r["scene_id"], r["im_id"])].append(ei)
    pair_errs = {}  # (ei, gt_id) -> list per tau
    eval_keys = _eval_images(gt_by_im, targets_ntop, obj_id)
    for key in eval_keys:
        gts = gt_by_im[key]
        for ei in ests_by_im.get(key, []):
            r = ests[ei]
            gt0 = gts[0]
            if key not in depth_cache:
                dp = gt0.rgb_path.replace("/rgb/", "/depth/")
                dp = dp[:dp.rfind(".")] + ".png"
                raw = cv2.imread(dp, cv2.IMREAD_UNCHANGED)
                depth_cache[key] = (None if raw is None
                                    else raw.astype(np.float32) * gt0.depth_scale)
            depth = depth_cache[key]
            if depth is None:
                return None  # no depth for this split -> VSD unavailable
            for gt_id, gt in enumerate(gts):
                pair_errs[(ei, gt_id)] = B.vsd_error(
                    r["R"], r["t"], gt.R, gt.t, depth, gt.cam_K, verts, faces,
                    diameter, render_cache=render_cache,
                    est_key=("e", key, ei), gt_key=("g", key, gt_id))
        # the caches never get cross-image hits; evicting after each image
        # keeps RSS flat instead of holding every frame's float32 maps
        # (multi-GB on ycbv-sized splits)
        depth_cache.pop(key, None)
        render_cache.clear()

    taus = B.VSD_TAUS
    recalls = []
    for ti in range(len(taus)):
        groups = []
        for key in eval_keys:
            gts = gt_by_im[key]
            g_e = [{"score": ests[ei]["score"],
                    "errors": {g: pair_errs[(ei, g)][ti]
                               for g in range(len(gts))
                               if (ei, g) in pair_errs}}
                   for ei in ests_by_im.get(key, [])]
            # matching considers ALL estimates (official n_top = -1 for
            # bop19); inst_count limits only which GTs are valid
            groups.append({"ests": g_e,
                           "gt_valid": _gt_valid_official(gts, key,
                                                          targets_ntop, obj_id),
                           "n_top": -1})
        recalls.append(B.official_average_recall(groups, np.arange(0.05, 0.51, 0.05)))
    return float(np.mean(recalls))


def _probe_im_width(gt_by_im, default: int = 640) -> int:
    """Image width for MSPD threshold scaling (official thresholds are
    (5..50) * w/640 px, eval_calc_scores.py); read from one rgb header."""
    import cv2
    for gts in gt_by_im.values():
        img = cv2.imread(gts[0].rgb_path)
        if img is not None:
            return int(img.shape[1])
        break
    return default


def main(csv_path: str, bop_path: str, dataset: str, split: str = "test",
         max_verts: int = 4096, im_width: int = 0):
    problems = B.check_bop_results_csv(csv_path)
    if problems:
        print("CSV format problems:", problems[:10])
        return None
    rows = B.load_bop_results_csv(csv_path)
    by_obj = defaultdict(list)
    for r in rows:
        by_obj[r["obj_id"]].append(r)

    minfo = load_models_info(bop_path, dataset, eval_models=True)
    # per-target inst_count (n_top) from the BOP19 targets file when present
    targets_ntop = {}
    try:
        with open(f"{bop_path}/{dataset}/test_targets_bop19.json") as f:
            for t in json.load(f):
                targets_ntop[(t["scene_id"], t["im_id"], t["obj_id"])] = \
                    int(t.get("inst_count", 0))
    except FileNotFoundError:
        pass

    per_obj = {}
    for obj_id, ests in sorted(by_obj.items()):
        gt_samples = scan_bop_object(bop_path, dataset, split, obj_id,
                                     visib_threshold=-1.0)
        # ALL GT instances per image (multi-instance scenes keep every one)
        gt_by_im = defaultdict(list)
        for s in gt_samples:
            gt_by_im[(s.scene_id, s.im_id)].append(s)
        verts = load_ply_vertices(model_ply_path(bop_path, dataset, obj_id,
                                                 eval_models=True))
        if len(verts) > max_verts:
            verts = verts[np.random.default_rng(0).choice(len(verts), max_verts,
                                                          replace=False)]
        sym_R, sym_t = B.sym_arrays(minfo[obj_id])
        diameter = float(minfo[obj_id]["diameter"])

        # errors of every estimate against EVERY GT instance of the object
        # in its image (official eval_calc_errors semantics)
        pairs = []  # (est_idx_in_ests, gt_id)
        Re, te, Rg, tg, Ks = [], [], [], [], []
        for ei, r in enumerate(ests):
            for gt_id, gt in enumerate(gt_by_im.get((r["scene_id"], r["im_id"]), [])):
                pairs.append((ei, gt_id))
                Re.append(r["R"]); te.append(r["t"])
                Rg.append(gt.R); tg.append(gt.t); Ks.append(gt.cam_K)
        if not pairs:
            continue
        errs = B.batched_bop_errors(
            jnp.asarray(np.stack(Re), jnp.float32), jnp.asarray(np.stack(te), jnp.float32),
            jnp.asarray(np.stack(Rg), jnp.float32), jnp.asarray(np.stack(tg), jnp.float32),
            jnp.asarray(np.stack(Ks), jnp.float32), jnp.asarray(verts, jnp.float32),
            jnp.asarray(sym_R), jnp.asarray(sym_t))
        mssd_e = np.asarray(errs["mssd"], np.float64) / diameter
        # official MSPD thresholds scale with image width ((5..50)*w/640);
        # equivalently scale the pixel errors by 640/w (w probed from the rgb
        # headers unless --im_width overrides): tless=720, itodd=1280, ...
        w_im = im_width or _probe_im_width(gt_by_im)
        mspd_e = np.asarray(errs["mspd"], np.float64) * (640.0 / w_im)

        # build official matching groups per (scene, im)
        est_errors = defaultdict(dict)   # est_idx -> {gt_id: (mssd_n, mspd)}
        for (ei, gt_id), em, ep in zip(pairs, mssd_e, mspd_e):
            est_errors[ei][gt_id] = (em, ep)
        groups_mssd, groups_mspd = [], []
        ests_by_im = defaultdict(list)
        for ei, r in enumerate(ests):
            ests_by_im[(r["scene_id"], r["im_id"])].append(ei)
        for key in _eval_images(gt_by_im, targets_ntop, obj_id):
            gts = gt_by_im[key]
            # official semantics (eval_calc_scores.py): only targeted images
            # count, the inst_count most-visible GTs are valid, and matching
            # considers all estimates (n_top = -1)
            gt_valid = _gt_valid_official(gts, key, targets_ntop, obj_id)
            e_idx = ests_by_im.get(key, [])
            g_m = [{"score": ests[ei]["score"],
                    "errors": {g: est_errors[ei][g][0] for g in est_errors[ei]}}
                   for ei in e_idx]
            g_p = [{"score": ests[ei]["score"],
                    "errors": {g: est_errors[ei][g][1] for g in est_errors[ei]}}
                   for ei in e_idx]
            groups_mssd.append({"ests": g_m, "gt_valid": gt_valid, "n_top": -1})
            groups_mspd.append({"ests": g_p, "gt_valid": gt_valid, "n_top": -1})

        ar_mssd = B.official_average_recall(groups_mssd, B.MSSD_THRESHOLDS)
        ar_mspd = B.official_average_recall(groups_mspd, B.MSPD_THRESHOLDS)
        ar_vsd = _try_vsd(ests, gt_by_im, targets_ntop, obj_id, bop_path,
                          dataset, minfo)
        rec = {
            "ar_mssd": ar_mssd, "ar_mspd": ar_mspd,
            "n_estimates": len(ests),
            "n_gt": sum(len(v) for v in gt_by_im.values()),
        }
        if ar_vsd is not None:
            rec["ar_vsd"] = ar_vsd
        per_obj[obj_id] = rec

    # the combined AR must aggregate the SAME metric set for every object:
    # if any object lacks VSD (no depth/faces), all objects' "ar" fall back
    # to mean(MSSD, MSPD) so per-object and overall numbers stay comparable
    have_vsd = bool(per_obj) and all("ar_vsd" in v for v in per_obj.values())
    for rec in per_obj.values():
        rec["ar"] = ((rec["ar_vsd"] + rec["ar_mssd"] + rec["ar_mspd"]) / 3.0
                     if have_vsd else 0.5 * (rec["ar_mssd"] + rec["ar_mspd"]))
    keys = ("ar_mssd", "ar_mspd", "ar") + (("ar_vsd",) if have_vsd else ())
    if per_obj:
        overall = {k: float(np.mean([v[k] for v in per_obj.values()]))
                   for k in keys}
    else:
        overall = {}
    note = ("official BOP19 matching; AR = mean(VSD, MSSD, MSPD)" if have_vsd
            else "official BOP19 matching; VSD unavailable for >=1 object "
                 "(no test depth images or mesh faces on disk) -- AR "
                 "averages MSSD+MSPD only, uniformly for all objects")
    if not per_obj:
        note = "no CSV estimates matched any GT of the split; nothing scored"
    report = {"per_object": per_obj, "overall": overall, "note": note}
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--csv", required=True)
    p.add_argument("--bop_path", required=True)
    p.add_argument("--dataset", required=True)
    p.add_argument("--split", default="test")
    p.add_argument("--im_width", type=int, default=0,
                   help="image width for MSPD scaling (0 = probe from rgb)")
    a = p.parse_args()
    main(a.csv, a.bop_path, a.dataset, a.split, im_width=a.im_width)
