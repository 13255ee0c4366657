"""Batched RANSAC-PnP on device.

TPU-native replacement for the reference's per-image
`cv2.solvePnPRansac(SOLVEPNP_EPNP, reprojErr=2, iters=150)` and the
Progressive-X path (`test_network_with_test_data.py:68-115`): a fixed-size
hypothesis batch is solved and scored in parallel, then the best model is
polished by weighted EPnP + Gauss-Newton on its inliers. vmap over images
gives whole-test-set pose solving in one jitted call.

The `use_progressivex` reference flag maps to `soft_inlier_sigma > 0` plus
`coherence_weight > 0`: inlier scoring becomes a soft sigmoid weighting and
the iterated reweighting diffuses inlier weights over the 2D neighborhood
graph (ball radius = Prog-X's `neighborhood_ball_radius`, 20 px; weight =
its `spatial_coherence_weight`, 0.1 — `CNN_output_to_pose.py:262-273`).
That diffusion is a one-sweep relaxation of the Potts spatial-coherence
energy Prog-X minimizes in its PEARL labeling step: neighboring
correspondences pull each other toward the same inlier/outlier label.
Prog-X's Tanimoto-similarity test (reject a new model whose inlier set
overlaps an accepted one at >= 0.9) governs *multi-instance* model growth;
CheckerPose always solves one instance per crop (single-model output at
`test_network_with_test_data.py:93-115`), so that test has no effect here
and is intentionally not replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from checkerpose_tpu.solver.epnp import epnp, refine_pose_gn, reproj_errors

# Low-latency serving profile (~2.3x cheaper than the defaults at batch 64,
# BENCH.md solver sweep): half the hypothesis budget, no EPnP re-seed (it
# only rescues a poor best hypothesis -- with >= 64 hypotheses it essentially
# never wins), shorter GN polish. Accuracy-gated by
# tests/test_oracle_noise.py::test_decode_solve_fast_profile_at_reference_noise
# and tests/test_solver.py::test_ransac_fast_profile.
FAST_PROFILE = dict(num_hyp=64, refine_iters=5, reseed=False, n_backtrack=2)


def _sample_hypotheses(key, valid, num_hyp: int, sample_size: int):
    """Sample `num_hyp` index sets of `sample_size` from valid points.

    Gumbel-top-k over masked logits: keeps static shapes; invalid points get
    -inf logit so they are only picked when fewer than sample_size valid
    points exist (in which case the caller's fallback applies anyway).
    """
    N = valid.shape[0]
    logits = jnp.where(valid > 0.5, 0.0, -1e9)
    g = jax.random.gumbel(key, (num_hyp, N))
    _, idx = jax.lax.top_k(logits[None] + g, sample_size)
    return idx  # (num_hyp, sample_size)


@partial(jax.jit, static_argnames=("num_hyp", "sample_size", "refine_iters",
                                   "irls_rounds", "soft_inlier_sigma",
                                   "coherence_weight", "reseed",
                                   "n_backtrack"))
def ransac_pnp(p3d: jnp.ndarray, p2d: jnp.ndarray, valid: jnp.ndarray,
               K: jnp.ndarray, key, num_hyp: int = 128, sample_size: int = 6,
               reproj_thresh: float = 2.0, refine_iters: int = 8,
               irls_rounds: int = 2, soft_inlier_sigma: float = 0.0,
               coherence_weight: float = 0.0,
               neighborhood_radius: float = 20.0, reseed: bool = True,
               n_backtrack: int = 3):
    """Robust pose from 2D-3D correspondences with validity mask.

    Args:
      p3d: (N, 3); p2d: (N, 2); valid: (N,) float {0,1}; K: (3,3).
      num_hyp: hypothesis count (the reference's cv_max_iters=150 analog).
      reproj_thresh: inlier threshold in pixels (reference uses 2).
      soft_inlier_sigma: 0 = hard inliers (OpenCV-like); >0 = soft sigmoid
        weights (Progressive-X-like robustness).
      coherence_weight: 0 = pure data term; >0 adds a mean-field Potts
        smoothing step: each point's inlier logit is nudged by the consensus
        of its 2D neighbors within `neighborhood_radius` px, so borderline
        residuals get tipped toward their neighborhood's label while gross
        outliers (large negative logit) stay rejected (Prog-X spatial-
        coherence analog; Prog-X defaults: weight 0.1, ball radius 20 --
        see module docstring).

    Returns dict(R (3,3), t (3,), inliers (N,) float, num_inliers (),
    success () bool). When fewer than 4 valid points exist the reference
    returns identity pose (`test_network_with_test_data.py:112-115`); we do
    the same via `success`/jnp.where.
    """
    n_valid = jnp.sum(valid)

    idx = _sample_hypotheses(key, valid, num_hyp, sample_size)      # (H, S)
    h3d = p3d[idx]                                                   # (H, S, 3)
    h2d = p2d[idx]
    # with fewer than sample_size valid points the sampler must include
    # invalid indices -- weight them 0 so a 4-5-valid-point solve is a clean
    # (if minimal) weighted EPnP rather than one polluted by garbage pairs
    hw = valid[idx]

    # hypothesis solves use the eigh-free EPnP (inverse iteration): ~3x
    # cheaper with tens of thousands of minimal solves per batch
    Rs, ts = jax.vmap(lambda a, b, w: epnp(a, b, K, w, use_eigh=False))(h3d, h2d, hw)
    errs = jax.vmap(lambda R, t: reproj_errors(R, t, p3d, p2d, K))(Rs, ts)  # (H, N)
    if soft_inlier_sigma > 0:
        scores = jnp.sum(jax.nn.sigmoid((reproj_thresh - errs) / soft_inlier_sigma)
                         * valid[None], axis=1)
    else:
        scores = jnp.sum((errs < reproj_thresh) * valid[None], axis=1)
    best = jnp.argmax(scores)
    R0, t0 = Rs[best], ts[best]

    # iterated (re)weighted polish: re-estimate inliers, then Gauss-Newton
    # warm-started from the current best pose. A fresh EPnP re-seed competes
    # as a second candidate in the FIRST round only (useful when the best
    # hypothesis was poor); once the warm start has been GN-polished on the
    # full inlier set, a re-seed essentially never wins and costs a full
    # EPnP + GN chain per round (round-1 VERDICT weak #1). A warm start is
    # never replaced by a worse candidate.
    if coherence_weight > 0:
        # 2D neighborhood graph (row-normalized adjacency) for the spatial-
        # coherence diffusion; invalid points neither give nor receive
        d2 = jnp.sum((p2d[:, None] - p2d[None]) ** 2, axis=-1)
        adj = ((d2 < neighborhood_radius ** 2) & (d2 > 0)).astype(jnp.float32)
        adj = adj * valid[None] * valid[:, None]
        adj_rownorm = adj / jnp.maximum(jnp.sum(adj, axis=1, keepdims=True), 1.0)

    def inlier_w(R, t):
        e = reproj_errors(R, t, p3d, p2d, K)
        if soft_inlier_sigma > 0:
            w = jax.nn.sigmoid((reproj_thresh - e) / soft_inlier_sigma) * valid
        else:
            w = (e < reproj_thresh).astype(jnp.float32) * valid
        if coherence_weight > 0:
            # mean-field update of the Potts coherence term: logit_i +=
            # kappa * (2*consensus_i - 1). Sharpness follows the data term
            # (hard mode uses a 0.25 px relaxation); kappa maps Prog-X's
            # relative weight into logit units (0.1 -> 1.0: can flip points
            # within ~sigma of the threshold, never a gross outlier).
            sig = soft_inlier_sigma if soft_inlier_sigma > 0 else 0.25
            logit = (reproj_thresh - e) / sig
            consensus = adj_rownorm @ (jax.nn.sigmoid(logit) * valid)
            kappa = 10.0 * coherence_weight
            w = jax.nn.sigmoid(logit + kappa * (2.0 * consensus - 1.0)) * valid
        # guard: if no inliers survive keep previous estimate via weights=valid
        return jnp.where(jnp.sum(w) >= 4, w, valid)

    def werr(R, t, w):
        return jnp.sum(reproj_errors(R, t, p3d, p2d, K) * w) / (jnp.sum(w) + 1e-9)

    def keep_better(R, t, Rc, tc, w):
        better = werr(Rc, tc, w) < werr(R, t, w)
        return jnp.where(better, Rc, R), jnp.where(better, tc, t)

    # irls_rounds=0: no polish at all -- return the raw best hypothesis
    if irls_rounds <= 0:
        final_err = reproj_errors(R0, t0, p3d, p2d, K)
        inliers = (final_err < reproj_thresh).astype(jnp.float32) * valid
        success = n_valid >= 4
        return {"R": jnp.where(success, R0, jnp.eye(3)),
                "t": jnp.where(success, t0, jnp.zeros(3)),
                "inliers": inliers, "num_inliers": jnp.sum(inliers),
                "success": success}

    # round 1: warm GN (vs fresh EPnP re-seed + GN when reseed=True; the
    # reseed mainly rescues a poor best hypothesis -- with enough hypotheses
    # it rarely wins, and dropping it removes a full EPnP + GN chain of
    # sequential latency)
    w = inlier_w(R0, t0)
    R1, t1 = refine_pose_gn(R0, t0, p3d, p2d, K, w, iters=refine_iters,
                            n_backtrack=n_backtrack)
    if reseed:
        R2, t2 = epnp(p3d, p2d, K, w)
        R2, t2 = refine_pose_gn(R2, t2, p3d, p2d, K, w, iters=refine_iters,
                                n_backtrack=n_backtrack)
        use2 = werr(R2, t2, w) < werr(R1, t1, w)
        Rc = jnp.where(use2, R2, R1)
        tc = jnp.where(use2, t2, t1)
    else:
        Rc, tc = R1, t1
    Rf, tf = keep_better(R0, t0, Rc, tc, w)

    # later rounds: refresh inliers, GN-only
    def polish(carry, _):
        R, t = carry
        w = inlier_w(R, t)
        Rc, tc = refine_pose_gn(R, t, p3d, p2d, K, w, iters=refine_iters,
                                n_backtrack=n_backtrack)
        return keep_better(R, t, Rc, tc, w), None

    (Rf, tf), _ = jax.lax.scan(polish, (Rf, tf), None,
                               length=max(irls_rounds - 1, 0))

    final_err = reproj_errors(Rf, tf, p3d, p2d, K)
    inliers = (final_err < reproj_thresh).astype(jnp.float32) * valid
    # degenerate correspondence geometry (e.g. all points collapsed onto one
    # pixel) can drive EPnP/GN to a NaN pose: that is a FAILED solve, same
    # identity-pose fallback as n_valid < 4 (reference returns success=False
    # from solvePnPRansac there too)
    finite = jnp.all(jnp.isfinite(Rf)) & jnp.all(jnp.isfinite(tf))
    success = (n_valid >= 4) & finite

    eyeR = jnp.eye(3)
    zt = jnp.zeros(3)
    R_out = jnp.where(success, Rf, eyeR)
    t_out = jnp.where(success, tf, zt)
    return {"R": R_out, "t": t_out, "inliers": inliers,
            "num_inliers": jnp.sum(inliers), "success": success}


@partial(jax.jit, static_argnames=("kw_items",))
def _solve_poses_jit(p3d, p2d, valid, K, key, kw_items):
    kw = dict(kw_items)
    B = p2d.shape[0]
    keys = jax.random.split(key, B)
    if p3d.ndim == 2:
        p3d = jnp.broadcast_to(p3d[None], (B,) + p3d.shape)
    if K.ndim == 2:
        K = jnp.broadcast_to(K[None], (B, 3, 3))
    return jax.vmap(lambda a, b, v, k, kk: ransac_pnp(a, b, v, k, kk, **kw))(
        p3d, p2d, valid, K, keys)


def solve_poses_batched(p3d, p2d, valid, K, key, **kw):
    """vmap of ransac_pnp over a batch of images, jitted end-to-end (the
    broadcast/split preamble was eager before -- ~0.4 s/op dispatch on this
    host, CLAUDE.md env rule 4).

    p3d: (N, 3) shared keypoints or (B, N, 3); p2d: (B, N, 2);
    valid: (B, N); K: (3,3) or (B, 3, 3). Returns dict of stacked outputs.
    """
    return _solve_poses_jit(jnp.asarray(p3d), jnp.asarray(p2d),
                            jnp.asarray(valid), jnp.asarray(K), key,
                            tuple(sorted(kw.items())))
