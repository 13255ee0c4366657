"""BOP19 pose-error metrics and average-recall scoring.

Device-side equivalents of the bop_toolkit scoring pipeline the reference
delegates to (`bop_toolkit/scripts/eval_bop19_pose.py` ->
`eval_calc_errors.py` -> `eval_calc_scores.py`):

  * MSSD: Maximum Symmetry-aware Surface Distance
      e = min_sym max_vertex || (R_est x + t_est) - (R_gt R_sym x + t_gt') ||
  * MSPD: Maximum Symmetry-aware Projection Distance (pixels), same min/max
      over projected vertices
  * BOP19 recall thresholds: MSSD theta in (0.05..0.50) * diameter,
      MSPD theta in (5..50) * w/640 px; AR = mean recall over thresholds.

VSD is intentionally out of scope: it requires a depth renderer and is the
only bop_toolkit metric that does (SURVEY.md §2.2); the official scripts
still accept our CSVs for a full VSD evaluation offline.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MSSD_THRESHOLDS = np.arange(0.05, 0.51, 0.05)           # * diameter
MSPD_THRESHOLDS = np.arange(5.0, 51.0, 5.0)             # * w/640 px


def _full_precision(fn):
    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


@_full_precision
def mssd(R_est, t_est, R_gt, t_gt, pts, sym_R, sym_t):
    """Max surface distance minimized over symmetry transforms.

    pts (V,3); sym_R (S,3,3), sym_t (S,3) (include identity as row 0).
    """
    pe = pts @ R_est.T + t_est[None]                       # (V,3)

    def per_sym(Rs, ts_):
        pg = (pts @ Rs.T + ts_[None]) @ R_gt.T + t_gt[None]
        return jnp.max(jnp.linalg.norm(pe - pg, axis=-1))

    return jnp.min(jax.vmap(per_sym)(sym_R, sym_t))


@_full_precision
def mspd(R_est, t_est, R_gt, t_gt, K, pts, sym_R, sym_t):
    """Max projected distance (px) minimized over symmetry transforms."""
    def proj(R, t):
        cam = pts @ R.T + t[None]
        z = jnp.maximum(cam[:, 2], 1e-6)
        u = K[0, 0] * cam[:, 0] / z + K[0, 2]
        v = K[1, 1] * cam[:, 1] / z + K[1, 2]
        return jnp.stack([u, v], -1)

    pe = proj(R_est, t_est)

    def per_sym(Rs, ts_):
        Rg = R_gt @ Rs
        tg = R_gt @ ts_ + t_gt
        pg = proj(Rg, tg)
        return jnp.max(jnp.linalg.norm(pe - pg, axis=-1))

    return jnp.min(jax.vmap(per_sym)(sym_R, sym_t))


@functools.partial(jax.jit, static_argnames=())
def batched_bop_errors(R_est, t_est, R_gt, t_gt, K, pts, sym_R, sym_t):
    """(B,) mssd + mspd for a batch against shared pts/syms."""
    f1 = jax.vmap(lambda a, b, c, d: mssd(a, b, c, d, pts, sym_R, sym_t))
    f2 = jax.vmap(lambda a, b, c, d, k: mspd(a, b, c, d, k, pts, sym_R, sym_t))
    return {"mssd": f1(R_est, t_est, R_gt, t_gt),
            "mspd": f2(R_est, t_est, R_gt, t_gt, K)}


def bop19_average_recall(mssd_errs: np.ndarray, mspd_errs: np.ndarray,
                         diameter: float, im_width: int = 640):
    """BOP19-style AR over MSSD+MSPD threshold grids (VSD excluded).

    Errors of failed estimates should be +inf. Returns dict with per-metric
    AR and the combined mean.
    """
    mssd_errs = np.asarray(mssd_errs)
    mspd_errs = np.asarray(mspd_errs)
    ar_mssd = float(np.mean([(mssd_errs < th * diameter).mean()
                             for th in MSSD_THRESHOLDS]))
    scale = im_width / 640.0
    ar_mspd = float(np.mean([(mspd_errs < th * scale).mean()
                             for th in MSPD_THRESHOLDS]))
    return {"ar_mssd": ar_mssd, "ar_mspd": ar_mspd,
            "ar": 0.5 * (ar_mssd + ar_mspd)}


VSD_TAUS = np.arange(0.05, 0.51, 0.05)                   # * diameter (bop19)
VSD_DELTA = 15.0                                         # mm (bop19)


def depth_to_dist(depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    """Depth (z) image -> euclidean distance image
    (misc.depth_im_to_dist_im_fast semantics)."""
    h, w = depth.shape
    us = (np.arange(w) - K[0, 2]) / K[0, 0]
    vs = (np.arange(h) - K[1, 2]) / K[1, 1]
    scale = np.sqrt(us[None, :] ** 2 + vs[:, None] ** 2 + 1.0)
    return depth.astype(np.float32) * scale.astype(np.float32)


def _visib_mask(d_test, d_model, delta):
    """bop19 visibility: visible where the model is in front of (or within
    delta of) the scene, or where the scene has no depth
    (bop_toolkit_lib/visibility.py:35-38)."""
    d_diff = d_model - d_test
    return np.logical_and(np.logical_or(d_diff <= delta, d_test == 0),
                          d_model > 0)


def vsd_error(R_est, t_est, R_gt, t_gt, depth_test, K, verts, faces,
              diameter: float, delta: float = VSD_DELTA, taus=VSD_TAUS,
              cost_type: str = "step",
              normalized_by_diameter: bool = True, render_cache=None,
              est_key=None, gt_key=None):
    """Visible Surface Discrepancy (Hodan et al., ECCV'18), the exact
    `pose_error.vsd` recipe backed by eval/renderer.py instead of the C++
    bop_renderer. Returns one error per tau.

    render_cache/est_key/gt_key: optional caller-owned cache of rendered
    DISTANCE maps keyed per pose -- matching is many-to-many (every estimate
    scores against every GT instance), so caching turns 2*E*G renders per
    image into E+G. The test-depth distance map is cached under
    id(depth_test).
    """
    from checkerpose_tpu.eval.renderer import render_depth
    h, w = depth_test.shape

    def dist_of(R, t, ck):
        if render_cache is not None and ck is not None and ck in render_cache:
            return render_cache[ck]
        d = depth_to_dist(render_depth(verts, faces, R, t, K, w, h), K)
        if render_cache is not None and ck is not None:
            render_cache[ck] = d
        return d

    dist_est = dist_of(R_est, t_est, est_key)
    dist_gt = dist_of(R_gt, t_gt, gt_key)
    tk = ("test", id(depth_test))
    if render_cache is not None and tk in render_cache:
        dist_test = render_cache[tk]
    else:
        dist_test = depth_to_dist(depth_test, K)
        if render_cache is not None:
            render_cache[tk] = dist_test

    visib_gt = _visib_mask(dist_test, dist_gt, delta)
    visib_est = _visib_mask(dist_test, dist_est, delta)
    # est pose is additionally "visible" wherever the GT pose is
    # (visibility.py:estimate_visib_mask_est; depth==0 <=> distance==0, so
    # the rendered-distance map carries the same support mask)
    visib_est = np.logical_or(visib_est, np.logical_and(visib_gt, dist_est > 0))

    inter = np.logical_and(visib_gt, visib_est)
    union = np.logical_or(visib_gt, visib_est)
    union_count = int(union.sum())
    comp_count = union_count - int(inter.sum())
    if union_count == 0:
        return [1.0] * len(list(taus))
    dists = np.abs(dist_gt[inter] - dist_est[inter])
    if normalized_by_diameter:
        dists = dists / diameter
    errors = []
    for tau in taus:
        if cost_type == "step":
            costs = (dists >= tau).sum()
        elif cost_type == "tlinear":
            costs = np.clip(dists / tau, None, 1.0).sum()
        else:
            raise ValueError(cost_type)
        errors.append(float((costs + comp_count) / union_count))
    return errors


def match_poses_greedy(ests, error_th: float, max_ests: int, gt_valid):
    """Official greedy estimate<->GT matching for ONE (scene, im, obj) group
    (bop_toolkit_lib/pose_matching.py:match_poses).

    ests: list of {"score": float, "errors": {gt_id: err}} sorted arbitrarily;
    matched greedily in decreasing score, each estimate/GT used at most once,
    only valid GTs, err < error_th. max_ests <= 0 means all.
    Returns list of (est_index, gt_id) matches.
    """
    order = sorted(range(len(ests)), key=lambda i: ests[i]["score"], reverse=True)
    if max_ests > 0:
        order = order[:max_ests]
    matched_gt = set()
    matches = []
    for i in order:
        best_gt, best_err = -1, error_th
        for gt_id, err in ests[i]["errors"].items():
            if gt_id in matched_gt or not gt_valid[gt_id]:
                continue
            if err < best_err:
                best_gt, best_err = gt_id, err
        if best_gt >= 0:
            matched_gt.add(best_gt)
            matches.append((i, best_gt))
    return matches


def official_average_recall(groups, thresholds) -> float:
    """BOP19 6D-localization AR with official matching semantics
    (eval_calc_scores.py:261-275 + score.calc_localization_scores).

    groups: one per (scene_id, im_id, obj_id):
      {"ests": [{"score", "errors": {gt_id: normalized_err}}],
       "gt_valid": [bool per GT instance of this object in this image],
       "n_top": int}   # inst_count from the targets file; <=0 = all
    Recall per threshold = matched valid GTs / total valid GT instances;
    AR = mean over thresholds.
    """
    recalls = []
    for th in thresholds:
        tp, tars = 0, 0
        for g in groups:
            n_valid = int(np.sum(g["gt_valid"]))
            n_top = g.get("n_top", 0)
            tars += min(n_top, n_valid) if n_top > 0 else n_valid
            tp += len(match_poses_greedy(g["ests"], float(th),
                                         g.get("n_top", 0), g["gt_valid"]))
        recalls.append(tp / max(tars, 1))
    return float(np.mean(recalls))


def sym_arrays(model_info: dict, max_sym_disc_step: float = 0.01,
               max_syms: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """(S,3,3), (S,3) symmetry arrays (identity first) from models_info,
    capped to max_syms by uniform subsampling of continuous symmetries."""
    from checkerpose_tpu.eval.metrics import symmetry_transformations
    syms = symmetry_transformations(model_info, max_sym_disc_step)
    if len(syms) > max_syms:
        idx = np.linspace(0, len(syms) - 1, max_syms).astype(int)
        idx[0] = 0
        syms = [syms[i] for i in idx]
    R = np.stack([s[0] for s in syms]).astype(np.float32)
    t = np.stack([s[1] for s in syms]).astype(np.float32)
    return R, t


def check_bop_results_csv(path: str) -> List[str]:
    """Validate a BOP19 result CSV (the `check_results_bop19` equivalent,
    bop_toolkit_lib/inout.py:296). Returns a list of problems (empty = OK)."""
    problems = []
    with open(path) as f:
        header = f.readline().strip()
        if header != "scene_id,im_id,obj_id,score,R,t,time":
            problems.append(f"bad header: {header}")
        for ln, line in enumerate(f, start=2):
            parts = line.strip().split(",")
            if len(parts) != 7:
                problems.append(f"line {ln}: {len(parts)} fields")
                continue
            try:
                int(parts[0]); int(parts[1]); int(parts[2]); float(parts[3])
                R = [float(x) for x in parts[4].split()]
                t = [float(x) for x in parts[5].split()]
                float(parts[6])
                if len(R) != 9:
                    problems.append(f"line {ln}: R has {len(R)} values")
                if len(t) != 3:
                    problems.append(f"line {ln}: t has {len(t)} values")
            except ValueError as e:
                problems.append(f"line {ln}: {e}")
    return problems


def load_bop_results_csv(path: str):
    """Parse a BOP19 CSV into a list of dicts (inout.load_bop_results
    equivalent)."""
    out = []
    with open(path) as f:
        f.readline()
        for line in f:
            p = line.strip().split(",")
            if len(p) != 7:
                continue
            out.append({
                "scene_id": int(p[0]), "im_id": int(p[1]), "obj_id": int(p[2]),
                "score": float(p[3]),
                "R": np.array([float(x) for x in p[4].split()]).reshape(3, 3),
                "t": np.array([float(x) for x in p[5].split()]),
                "time": float(p[6]),
            })
    return out
