"""Evaluation harnesses.

`evaluate_init` mirrors the reference's in-training `test_init`
(`test_network_with_test_data.py:122-206`); `evaluate_pipeline` mirrors
`test_pipeline` / the offline `test.py` loop (`test_network_with_test_data.py:
301-527`, `test.py:279-525`): forward, decode to correspondences under three
filter modes (none / full-mask / visib-mask), pose solve, ADD(-S) pass rates
at 0.02/0.05/0.1 diameter, rotation/translation errors, seg metrics, AUC.

Everything heavy is batched on device; the host only aggregates scalars.
"""
from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional

import jax
import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.eval import metrics as M
from checkerpose_tpu.eval.decode import (adaptive_ids,
                                          ids_to_correspondences, soft_ids)
from checkerpose_tpu.ops import codes as _codes
from checkerpose_tpu.solver.ransac import solve_poses_batched
from checkerpose_tpu.train import steps


@functools.partial(jax.jit, static_argnames=("res",))
def _bit_errors(x_id, y_id, roi_mask, proj_xy, bbox, res: int):
    """Per-bit code errors of the hard predictions vs GT labels, masked by
    the GT in-RoI bit (reference test.py:432-451 semantics). Returns
    (B, 1 + 2*log2(res))."""
    from checkerpose_tpu.ops import geometry as _geom
    L = int(math.log2(res))
    f = functools.partial(_geom.make_code_labels, crop_size_gt=res)
    gt_bit, gt_x, gt_y = jax.vmap(f)(proj_xy, bbox)
    m = gt_bit[:, :, None]
    n = jnp.clip(jnp.sum(gt_bit, axis=1), 1.0, None)
    dxb = jnp.abs(_codes.ids_to_codes(x_id, L) - _codes.ids_to_codes(gt_x, L)) * m
    dyb = jnp.abs(_codes.ids_to_codes(y_id, L) - _codes.ids_to_codes(gt_y, L)) * m
    err_roi = jnp.mean(jnp.abs(roi_mask - gt_bit), axis=1)
    return jnp.concatenate([
        err_roi[:, None],
        jnp.sum(dxb, axis=1) / n[:, None],
        jnp.sum(dyb, axis=1) / n[:, None]], axis=1)


def evaluate_init(net, knn_idx, variables, loader, crop_size_gt: int,
                  best_score_metric: Optional[str] = None) -> Dict[str, float]:
    ev = steps.make_init_eval_step(net, knn_idx, crop_size_gt)
    accs_mask, accs_x, accs_y, bit_errs = [], [], [], []
    for batch in loader:
        n_real = int(batch.pop("n_real", len(batch["image"])))
        out = ev(variables, batch)
        # dummy samples (valid=0: decode failure / missed detection) carry
        # degenerate labels; keep them out of the means that gate the best
        # checkpoint
        keep = np.asarray(batch.get("valid", np.ones(n_real)))[:n_real] > 0.5
        accs_mask.append(np.asarray(out["acc_mask"])[:n_real][keep])
        accs_x.append(np.asarray(out["acc_x"])[:n_real][keep])
        accs_y.append(np.asarray(out["acc_y"])[:n_real][keep])
        bit_errs.append(np.asarray(out["bit_err"])[:n_real][keep])
    if not accs_mask or not np.concatenate(accs_mask).size:
        # empty/missing val split (scan_bop_object returns [] silently):
        # report a neutral zero score instead of crashing the training run
        # at its first eval
        return {"test_acc": 0.0, "acc_mask": 0.0, "acc_x": 0.0, "acc_y": 0.0,
                "bit_err": np.zeros(1 + 2 * net.res_log2), "n_images": 0}
    acc_mask = float(np.concatenate(accs_mask).mean())
    acc_x = float(np.concatenate(accs_x).mean())
    acc_y = float(np.concatenate(accs_y).mean())
    bit_err = np.concatenate(bit_errs).mean(axis=0)
    if best_score_metric is None:
        test_acc = acc_mask * 0.5 + acc_x * 0.25 + acc_y * 0.25
    elif best_score_metric == "mean_bit_acc":
        test_acc = 1.0 - float(bit_err.mean())
    else:
        raise ValueError(best_score_metric)
    return {"test_acc": test_acc, "acc_mask": acc_mask, "acc_x": acc_x,
            "acc_y": acc_y, "bit_err": bit_err}


FILTER_MODES = ("none", "full", "visib")

DEFAULT_TAU_GRID = (3.0, 4.0, 5.0, 6.0, 8.0)


def calibrate_decode_tau(net, knn_idx, variables, loader_factory, p3d_xyz,
                         diameter: float, *, stage: int,
                         taus=DEFAULT_TAU_GRID, main_filter: str = "visib",
                         **eval_kw):
    """Pick decode_conf_tau by sweeping a SMALL held-out val slice.

    The optimal confidence-truncation depth is training-state dependent
    (measured round 3: tau=3 optimal at one checkpoint, pessimal at the
    next — 0.19 vs 0.60 adx10 on identical weights), so any fixed tau is an
    unreproducible protocol. This sweeps `taus` on the slice produced by
    `loader_factory` (≤~32 images), scores adx10 under `main_filter`, and
    returns (best_tau, {tau: adx10}). Ties break toward the SMALLEST tau
    (less truncation = closer to reference hard-decode parity).
    """
    sweep = {}
    for tau in taus:
        rep = evaluate_pipeline(
            net, knn_idx, variables, loader_factory(), p3d_xyz, diameter,
            stage=stage, filter_modes=(main_filter,), main_filter=main_filter,
            decode_mode="adaptive", decode_conf_tau=float(tau), **eval_kw)
        sweep[float(tau)] = rep[main_filter]["adx10"]
    best = min(sorted(sweep), key=lambda t: (-sweep[t], t))
    return best, sweep


def evaluate_pipeline(net, knn_idx, variables, loader, p3d_xyz, diameter: float,
                      *, stage: int, use_adi: bool = False, vertices=None,
                      reproj_thresh: float = 2.0, num_hyp: int = 128,
                      soft_inlier_sigma: float = 0.0,
                      coherence_weight: float = 0.0,
                      neighborhood_radius: float = 20.0,
                      discard_bd_pixel: int = 0,
                      filter_modes=FILTER_MODES, main_filter: str = "visib",
                      sym_rots=None, seed: int = 0,
                      decode_mode: str = "hard",
                      decode_conf_tau: float = 3.0,
                      filter_judge_bits: Optional[int] = None) -> Dict:
    """Full eval sweep. Returns aggregate metrics + per-image poses for CSV.

    p3d_xyz: (N, 3) keypoints (mm) used for PnP; `vertices`: denser model
    vertices for ADD/ADI (defaults to p3d_xyz, the reference evaluates ADD on
    the keypoint cloud too via `metric.Calculate_ADD_Error_BOP`).
    sym_rots: optional (K, 3, 3) discrete symmetries for closest-symmetric
    rotation-error reporting (reference test_lm.py:33-55).

    All requested filter modes share ONE forward and ONE stacked solver
    dispatch per batch (the filters differ only in correspondence validity),
    so adding modes costs solver *batch*, not extra launches.
    """
    fwd = steps.make_pose_forward(net, knn_idx, stage)
    # the net declares its id resolution: 2**(3+stage) for the progressive
    # net, full 2**res_log2 at every stage for the woProg ablation (whose
    # ids would otherwise be scaled onto the wrong grid here)
    res = 2 ** (net.output_res_log2(stage) if hasattr(net, "output_res_log2")
                else (3 + stage))
    verts = jnp.asarray(vertices if vertices is not None else p3d_xyz, jnp.float32)
    p3dj = jnp.asarray(p3d_xyz, jnp.float32)
    sym_j = None if sym_rots is None else jnp.asarray(sym_rots, jnp.float32)
    key = jax.random.PRNGKey(seed)

    per_mode_errs = {m: [] for m in filter_modes}
    per_mode_re = {m: [] for m in filter_modes}
    per_mode_te = {m: [] for m in filter_modes}
    per_mode_nvalid = {m: [] for m in filter_modes}
    poses: List[Dict] = []
    seg_acc, seg_iou = [], []
    bit_errs = []
    n_images = 0

    for batch in loader:
        n_real = int(batch.get("n_real", len(batch["image"])))
        # only the fields the jitted forward consumes go to the device --
        # shipping GT masks/poses/ids through the tunnel every batch is
        # pure H2D waste (and popping would mutate the caller's dict)
        fwd_batch = {k: batch[k] for k in ("image", "p3d_normed", "obj_idx")
                     if k in batch}
        out = fwd(variables, fwd_batch)
        key, sub = jax.random.split(key)
        R_gt = jnp.asarray(batch["R"])
        t_gt = jnp.asarray(batch["t"]).reshape(-1, 3)
        sample_valid = np.asarray(batch["valid"]) > 0.5
        B = R_gt.shape[0]
        nm = len(filter_modes)

        if decode_mode == "soft":
            dec_x, dec_y = soft_ids(out["x_logits"], out["y_logits"])
        elif decode_mode == "adaptive":
            dec_x, dec_y = adaptive_ids(out["x_logits"], out["y_logits"],
                                        decode_conf_tau)
        else:
            dec_x, dec_y = out["x_id"], out["y_id"]
        # seg/boundary filters judge the net's hard claim by default. With
        # unlearned fine bits that claim carries up-to-a-coarse-cell noise,
        # and the filter truncates it ASYMMETRICALLY (only inward-displaced
        # claims stay on the mask): the surviving 2D field is radially
        # shrunk (~3%) and EPnP absorbs it as pose bias — the round-4 hard-
        # decode filter collapse, reproduced model-free by
        # tools/diag_filter_collapse.py (0.375 -> 0.031 adx10 at bit-3-level
        # noise; surviving-subset radial alpha 0.971). filter_judge_bits=k
        # judges the filters at the top-k-bit cell CENTER instead, making
        # the filter decision independent of the noisy fine bits (recovers
        # 5x in the diagnostic). None = reference parity
        # (`test_network_with_test_data.py:56-62` judges the full-res ids).
        fx, fy = out["x_id"], out["y_id"]
        if filter_judge_bits is not None:
            L = int(math.log2(res))
            s = max(L - int(filter_judge_bits), 0)
            if s > 0:
                half = (1 << s) // 2
                fx = (fx.astype(jnp.int32) >> s << s) + half
                fy = (fy.astype(jnp.int32) >> s << s) + half
        p2d_all, valid_all = [], []
        for mode in filter_modes:
            seg = {"none": None, "full": out["seg_full"],
                   "visib": out["seg_visib"]}[mode]
            p2d, valid = ids_to_correspondences(
                dec_x, dec_y, out["roi_mask"],
                jnp.asarray(batch["bbox"]), crop_size_gt=res, seg_mask=seg,
                check_seg=(mode != "none"), discard_bd_pixel=discard_bd_pixel,
                filter_x_id=fx, filter_y_id=fy)
            p2d_all.append(p2d)
            valid_all.append(valid)
        camK = jnp.asarray(batch["cam_K"])
        sol_all = solve_poses_batched(
            p3dj, jnp.concatenate(p2d_all), jnp.concatenate(valid_all),
            jnp.tile(camK, (nm, 1, 1)), sub,
            num_hyp=num_hyp, reproj_thresh=reproj_thresh,
            soft_inlier_sigma=soft_inlier_sigma,
            coherence_weight=coherence_weight,
            neighborhood_radius=neighborhood_radius)
        errs_all = M.batched_pose_errors(
            sol_all["R"], sol_all["t"], jnp.tile(R_gt, (nm, 1, 1)),
            jnp.tile(t_gt, (nm, 1)), verts, use_adi=use_adi, sym_rots=sym_j)
        # materialize ONCE per batch; per-element jnp slicing below would be
        # eager dispatch (~0.4 s/op on this host, CLAUDE.md env rule 4)
        sol_all = {k: np.asarray(v) for k, v in sol_all.items()}
        errs_all = {k: np.asarray(v) for k, v in errs_all.items()}

        # filter-survival instrumentation (VERDICT r4 #3): how many
        # correspondences each filter keeps — the collapse signature is a
        # mode whose adx craters while counts stay high (systematic bias,
        # not solver starvation) or craters with counts < min-points
        # (identity fallback)
        nvalid_np = np.asarray(jnp.stack([v.sum(axis=1) for v in valid_all]))
        mode_results = {}
        for mi, mode in enumerate(filter_modes):
            sl = slice(mi * B, (mi + 1) * B)
            sol = {k: v[sl] for k, v in sol_all.items()}
            ok = sol["success"] & sample_valid
            adx = np.where(ok, errs_all["adx"][sl], np.inf)
            per_mode_errs[mode].append(adx[:n_real])
            per_mode_nvalid[mode].append(nvalid_np[mi][:n_real])
            per_mode_re[mode].append(
                np.where(ok, errs_all["re"][sl], 180.0)[:n_real])
            per_mode_te[mode].append(
                np.where(ok, errs_all["te"][sl], np.inf)[:n_real])
            mode_results[mode] = sol

        if "proj_xy" in batch:
            be = _bit_errors(out["x_id"], out["y_id"], out["roi_mask"],
                             jnp.asarray(batch["proj_xy"]),
                             jnp.asarray(batch["bbox"]), res)
            bit_errs.append(np.asarray(be)[:n_real][sample_valid[:n_real]])

        # seg metrics against GT visib mask at the stage resolution
        gt_mask = np.asarray(batch["mask_visib"])
        h = out["seg_visib"].shape[1]
        idx = (np.arange(h) * gt_mask.shape[1]) // h
        gt_small = gt_mask[:, idx][:, :, idx]
        pred_small = np.asarray(out["seg_visib"]) > 0.5
        for b in range(n_real):
            if not sample_valid[b]:
                continue
            err, iou = M.mask_metrics(pred_small[b], gt_small[b])
            seg_acc.append(1.0 - err)
            seg_iou.append(iou)

        main = mode_results[main_filter if main_filter in filter_modes else filter_modes[0]]
        for b in range(n_real):
            poses.append({
                "scene_id": int(batch["scene_id"][b]),
                "im_id": int(batch["im_id"][b]),
                "R": np.asarray(main["R"][b]),
                "t": np.asarray(main["t"][b]),
                "score": 1.0 if (sample_valid[b] and bool(main["success"][b])) else -1.0,
            })
        n_images += n_real

    report: Dict = {"n_images": n_images, "poses": poses}
    if n_images == 0:
        # empty test loader: neutral report, not a np.concatenate crash
        for mode in filter_modes:
            report[mode] = {k: 0.0 for k in ("adx02", "adx05", "adx10",
                                             "auc_posecnn", "mean_re_deg",
                                             "mean_te_mm", "rete2", "rete5",
                                             "re2", "re5", "te2", "te5",
                                             "n_valid_mean", "n_valid_lt6_frac")}
        report["seg_acc"] = report["seg_iou"] = 0.0
        report["test_acc"] = 0.0
        return report
    for mode in filter_modes:
        errs = np.concatenate(per_mode_errs[mode])
        res_m = {}
        for frac, name in ((0.02, "adx02"), (0.05, "adx05"), (0.10, "adx10")):
            res_m[name] = float((errs < frac * diameter).mean())
        res_m["auc_posecnn"] = M.compute_auc_posecnn(errs / 1000.0)
        re = np.concatenate(per_mode_re[mode])
        te = np.concatenate(per_mode_te[mode])
        res_m["mean_re_deg"] = float(np.mean(re))
        res_m["mean_te_mm"] = float(np.mean(te[np.isfinite(te)])) if np.isfinite(te).any() else float("inf")
        # rotation/translation pass rates (reference test_lm.py:319-327);
        # failed solves carry re=180, te=inf and so fail every threshold,
        # matching the reference's nan->10000
        res_m.update(M.rete_pass_rates(re, te))
        nv = np.concatenate(per_mode_nvalid[mode])
        res_m["n_valid_mean"] = float(nv.mean())
        res_m["n_valid_lt6_frac"] = float((nv < 6).mean())
        report[mode] = res_m
    report["seg_acc"] = float(np.mean(seg_acc)) if seg_acc else 1.0
    report["seg_iou"] = float(np.mean(seg_iou)) if seg_iou else 1.0
    if bit_errs:
        report["bit_err"] = np.concatenate(bit_errs).mean(axis=0).tolist()
    # same fallback as the pose-export filter above: a main_filter not in
    # filter_modes must not KeyError away the whole sweep's results
    eff_main = main_filter if main_filter in filter_modes else filter_modes[0]
    report["test_acc"] = report[eff_main]["adx10"]
    return report
