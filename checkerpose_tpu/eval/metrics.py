"""Pose + segmentation metrics, batched on device.

Equivalents of the reference's metric glue (`metric.py:8-18` over bop_toolkit
`pose_error.add/adi/re/te`, `pose_error.py:147-211`) and the PoseCNN AUC
(`test.py:37-57`). ADI's nearest-neighbor uses a chunked pairwise-distance
matmul on device instead of a host cKDTree (SURVEY §7 step 7).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _full_precision(fn):
    # f32 matmuls default to bf16 on this backend; metrics need true f32
    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


@_full_precision
def add_error(R_est, t_est, R_gt, t_gt, pts):
    """Average distance of model points under the two poses (mm).

    pose_error.add (`pose_error.py:147-161`). Batched over leading dims of
    R_est/t_est if present.
    """
    pe = pts @ jnp.swapaxes(R_est, -1, -2) + t_est[..., None, :]
    pg = pts @ jnp.swapaxes(R_gt, -1, -2) + t_gt[..., None, :]
    return jnp.mean(jnp.linalg.norm(pe - pg, axis=-1), axis=-1)


@_full_precision
def adi_error(R_est, t_est, R_gt, t_gt, pts, chunk: int = 512):
    """Average closest-point distance for symmetric objects (mm).

    pose_error.adi (`pose_error.py:164-184`): for each GT-posed vertex, the
    distance to the nearest estimated-posed vertex. Chunked (V_gt x V_est)
    distance computation stays in HBM-sized blocks.
    """
    pe = pts @ R_est.T + t_est[None]
    pg = pts @ R_gt.T + t_gt[None]
    # center both clouds (distances are translation-invariant): the
    # ||a||^2 - 2ab + ||b||^2 expansion cancels catastrophically at
    # camera-frame magnitudes (~400mm) in f32
    c = jnp.mean(pg, axis=0)
    pe = pe - c
    pg = pg - c
    n = pg.shape[0]
    pe_sq = jnp.sum(pe ** 2, axis=1)

    def body(i, acc):
        rows = jax.lax.dynamic_slice_in_dim(pg, i * chunk, chunk, axis=0)
        d2 = (jnp.sum(rows ** 2, axis=1)[:, None] - 2 * rows @ pe.T + pe_sq[None])
        return acc.at[i].set(jnp.sqrt(jnp.maximum(d2.min(axis=1), 0.0)))

    n_chunks = (n + chunk - 1) // chunk
    pad = n_chunks * chunk - n
    pg = jnp.pad(pg, ((0, pad), (0, 0)))
    mins = jnp.zeros((n_chunks, chunk))
    mins = jax.lax.fori_loop(0, n_chunks, body, mins).reshape(-1)[:n]
    return jnp.mean(mins)


@_full_precision
def re_error(R_est, R_gt):
    """Rotation error in degrees (pose_error.re, `pose_error.py:187-202`)."""
    cos = (jnp.trace(R_est @ R_gt.T) - 1.0) * 0.5
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def te_error(t_est, t_gt):
    """Translation error (pose_error.te, `pose_error.py:205-211`)."""
    return jnp.linalg.norm(jnp.reshape(t_est, (3,)) - jnp.reshape(t_gt, (3,)))


def symmetry_transformations(model_info: dict, max_sym_disc_step: float = 0.01):
    """Discrete + sampled-continuous symmetry transforms from models_info.

    Same semantics as bop_toolkit misc.get_symmetry_transformations
    (`bop_toolkit_lib/misc.py:43`): continuous axes sampled so neighboring
    poses differ by <= max_sym_disc_step * diameter. Returns list of (R, t).
    """
    syms = [(np.eye(3), np.zeros(3))]
    for sd in model_info.get("symmetries_discrete", []):
        M = np.array(sd, np.float64).reshape(4, 4)
        syms.append((M[:3, :3], M[:3, 3]))
    for sc in model_info.get("symmetries_continuous", []):
        axis = np.array(sc["axis"], np.float64)
        offset = np.array(sc.get("offset", [0, 0, 0]), np.float64)
        diam = model_info.get("diameter", 100.0)
        n = max(int(np.ceil(np.pi / max_sym_disc_step)), 1)  # as in bop_toolkit
        for i in range(1, n + 1):
            ang = 2 * np.pi * i / (n + 1)
            k = axis / np.linalg.norm(axis)
            Kx = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
            R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * (Kx @ Kx)
            syms.append((R, offset - R @ offset))
    return syms


def closest_symmetric_rot_error(R_est, R_gt, sym_Rs: np.ndarray):
    """min over symmetries of re(R_est, R_gt @ R_sym) -- the reference's
    `get_closest_rot` (test_lm.py:33-55)."""
    def one(Rs):
        return re_error(jnp.asarray(R_est), jnp.asarray(R_gt) @ Rs)
    errs = jax.vmap(one)(jnp.asarray(sym_Rs))
    return jnp.min(errs)


def compute_auc_posecnn(errors: np.ndarray) -> float:
    """PoseCNN-style ADD AUC with 0.1 m cutoff; numpy, mirrors the exact
    VOCap recipe of the reference (`test.py:37-57`). `errors` in meters."""
    d = np.sort(np.asarray(errors, np.float64).copy())
    d[d > 0.1] = np.inf
    accuracy = np.cumsum(np.ones(d.shape[0])) / max(d.shape[0], 1)
    ids = np.isfinite(d)
    if d.shape[0] == 0 or ids.sum() == 0:
        return float("nan")
    rec = d[ids]
    prec = accuracy[ids]
    mrec = np.concatenate(([0], rec, [0.1]))
    mpre = np.concatenate(([0], prec, [prec[-1]]))
    for i in range(1, len(mpre)):
        mpre[i] = max(mpre[i], mpre[i - 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0] + 1
    return float(((mrec[idx] - mrec[idx - 1]) * mpre[idx]).sum() * 10)


def mask_metrics(pred: np.ndarray, gt: np.ndarray):
    """(pixelwise error, IoU); empty-union convention = IoU 1.0
    (`test_network_with_test_data.py:16-30`)."""
    err = float(np.mean(np.abs(pred - gt)))
    inter = np.logical_and(pred > 0.5, gt > 0.5).sum()
    union = np.logical_or(pred > 0.5, gt > 0.5).sum()
    iou = 1.0 if union < 1 else float(inter / union)
    return err, iou


@functools.partial(jax.jit, static_argnames=("use_adi",))
def batched_pose_errors(R_est, t_est, R_gt, t_gt, pts, use_adi: bool = False,
                        sym_rots=None):
    """(B,) ADD or ADI + re + te for a batch of poses against shared pts.

    sym_rots: optional (K, 3, 3) discrete symmetry rotations (include the
    identity); the rotation error is then reported against the closest
    symmetric GT, the reference's `get_closest_rot` (test_lm.py:33-55)."""
    if use_adi:
        adx = jax.vmap(lambda a, b, c, d: adi_error(a, b, c, d, pts))(
            R_est, t_est, R_gt, t_gt)
    else:
        adx = jax.vmap(lambda a, b, c, d: add_error(a, b, c, d, pts))(
            R_est, t_est, R_gt, t_gt)
    if sym_rots is None:
        re = jax.vmap(re_error)(R_est, R_gt)
    else:
        def one(Re, Rg):
            # Rg @ S must run in true f32: bf16 matmul error (~2^-8) in the
            # composed rotation feeds arccos near cos=1 and can report
            # degrees of error on a perfect pose (CLAUDE.md env rule 2)
            with jax.default_matmul_precision("float32"):
                return jnp.min(jax.vmap(lambda S: re_error(Re, Rg @ S))(sym_rots))
        re = jax.vmap(one)(R_est, R_gt)
    te = jax.vmap(te_error)(t_est, t_gt)
    return {"adx": adx, "re": re, "te": te}


def rete_pass_rates(re_deg: np.ndarray, te_mm: np.ndarray) -> dict:
    """Rotation/translation pass rates at the reference's thresholds
    (reference test_lm.py:319-327): rete2 = re<2deg AND te<20mm, rete5 =
    re<5deg AND te<50mm, plus the individual re@2/5deg and te@20/50mm rates.
    Failed solves should carry re=180 / te=inf (the reference maps NaN to
    10000) so they fail every threshold."""
    re_deg = np.asarray(re_deg, np.float64)
    te_mm = np.asarray(te_mm, np.float64)
    return {
        "rete2": float(((re_deg < 2.0) & (te_mm < 20.0)).mean()),
        "rete5": float(((re_deg < 5.0) & (te_mm < 50.0)).mean()),
        "re2": float((re_deg < 2.0).mean()),
        "re5": float((re_deg < 5.0).mean()),
        "te2": float((te_mm < 20.0).mean()),
        "te5": float((te_mm < 50.0).mean()),
    }
