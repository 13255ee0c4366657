"""EPnP + Gauss-Newton pose refinement, fully on device.

The reference solves PnP per image on the CPU via OpenCV's EPnP RANSAC or the
Progressive-X C++ library (`test_network_with_test_data.py:100-115`,
`CNN_output_to_pose.py:260-295`), serializing evaluation at batch size 1. Here
the solver is closed-form linear algebra in jnp -- vmappable over both RANSAC
hypotheses and images, so the whole test set's poses come out of a few jitted
calls on TPU.

Formulation notes (TPU float32-friendly):
  * 2D points are used in K-normalized coordinates x=(u-cx)/fx, y=(v-cy)/fy,
    which conditions the 12x12 EPnP normal matrix far better than raw pixels.
  * Weighted throughout: `w` in [0,1] per correspondence supports both
    validity masking (static shapes) and soft inlier reweighting.
  * Degenerate inputs (w.sum() < 4) yield a finite result; callers select the
    identity-pose fallback exactly like the reference does
    (`test_network_with_test_data.py:112-115`).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-9

def _full_precision(fn):
    """This backend executes f32 matmuls in bfloat16 by default (TPU MXU
    default precision); the solver's linear algebra needs true f32
    accumulation -- without this, Kabsch/GN plateau ~2 deg from optimum."""
    @functools.wraps(fn)
    def wrapped(*a, **k):
        with jax.default_matmul_precision("float32"):
            return fn(*a, **k)
    return wrapped


@_full_precision
def rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (3,) -> rotation matrix (3,3), Taylor-safe at 0."""
    theta = jnp.sqrt(jnp.sum(w ** 2) + _EPS)
    k = w / theta
    K = jnp.array([[0., -k[2], k[1]],
                   [k[2], 0., -k[0]],
                   [-k[1], k[0], 0.]])
    s, c = jnp.sin(theta), jnp.cos(theta)
    return jnp.eye(3) + s * K + (1. - c) * (K @ K)


@_full_precision
def _inv3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = A[0, 0], A[0, 1], A[0, 2]
    d, e, f = A[1, 0], A[1, 1], A[1, 2]
    g, h, i = A[2, 0], A[2, 1], A[2, 2]
    A11, A12, A13 = e * i - f * h, c * h - b * i, b * f - c * e
    A21, A22, A23 = f * g - d * i, a * i - c * g, c * d - a * f
    A31, A32, A33 = d * h - e * g, b * g - a * h, a * e - b * d
    det = a * A11 + b * A21 + c * A31
    adj = jnp.array([[A11, A12, A13], [A21, A22, A23], [A31, A32, A33]])
    return adj / (det + jnp.sign(det + _EPS) * _EPS)


def _normalize_2d(p2d: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([(p2d[:, 0] - cx) / fx, (p2d[:, 1] - cy) / fy], axis=-1)


@_full_precision
def quat_to_rot(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> rotation matrix. Orthogonal by
    construction (important: f32 SVD-based orthogonal Procrustes degrades to
    ~1e-3 orthogonality error when singular values cluster, which they always
    do here since the cross-covariance of a rigid correspondence is nearly a
    scaled rotation)."""
    q = q / (jnp.linalg.norm(q) + _EPS)
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _horn_matrix(S: jnp.ndarray) -> jnp.ndarray:
    """Horn's symmetric 4x4 from a 3x3 cross-covariance S."""
    Sxx, Sxy, Sxz = S[0, 0], S[0, 1], S[0, 2]
    Syx, Syy, Syz = S[1, 0], S[1, 1], S[1, 2]
    Szx, Szy, Szz = S[2, 0], S[2, 1], S[2, 2]
    return jnp.array([
        [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
        [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
        [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
        [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
    ])


@_full_precision
def _dominant_quat(N: jnp.ndarray, iters: int = 12) -> jnp.ndarray:
    """Dominant eigenvector of Horn's symmetric 4x4 by shifted power
    iteration: N + s*I is PSD-dominant for s >= |lambda_min|, and
    ||N||_F bounds every |lambda|. 4x4 matvecs are ~free on TPU next to a
    batched eigh (which XLA lowers to an iterative Jacobi loop)."""
    s = jnp.sqrt(jnp.sum(N * N)) + _EPS
    M = N + s * jnp.eye(4)
    v = jnp.full((4,), 0.5)

    def body(v, _):
        v = M @ v
        return v / (jnp.linalg.norm(v) + _EPS), None

    v, _ = jax.lax.scan(body, v, None, length=iters)
    return v


@_full_precision
def _weighted_kabsch(X: jnp.ndarray, Y: jnp.ndarray, w: jnp.ndarray,
                     use_eigh: bool = True):
    """Rigid transform Y ~ R X + t minimizing weighted residuals.

    Horn's closed-form quaternion method: largest eigenvector of the 4x4
    symmetric matrix built from the cross-covariance. use_eigh=False swaps
    the eigh for shifted power iteration (hypothesis fast path: thousands of
    these run per RANSAC batch and the dominant gap is large for any
    non-degenerate rigid fit).
    """
    wsum = jnp.sum(w) + _EPS
    cx = jnp.sum(X * w[:, None], axis=0) / wsum
    cy = jnp.sum(Y * w[:, None], axis=0) / wsum
    Xc, Yc = X - cx, Y - cy
    S = (Xc * w[:, None]).T @ Yc                       # S[a,b] = sum x_a y_b
    N = _horn_matrix(S)
    if use_eigh:
        evals, evecs = jnp.linalg.eigh(N)
        q = evecs[:, -1]                               # largest eigenvalue
    else:
        q = _dominant_quat(N)
    R = quat_to_rot(q)
    t = cy - R @ cx
    return R, t


@_full_precision
def epnp(p3d: jnp.ndarray, p2d: jnp.ndarray, K: jnp.ndarray, w: jnp.ndarray,
         use_eigh: bool = True):
    """Weighted EPnP (Lepetit et al. 2009 formulation, re-derived).

    Args:
      p3d: (N, 3) world/model points.
      p2d: (N, 2) pixel coordinates.
      K: (3, 3) intrinsics.
      w: (N,) weights in [0, 1] (0 = ignore the correspondence).
      use_eigh: null vector via eigh + one inverse-iteration polish (most
        accurate) or via pure inverse iteration from a fixed start (~3x
        cheaper on TPU; used for the RANSAC hypothesis stage where tens of
        thousands of minimal solves run per batch).

    Returns (R (3,3), t (3,)). All static shapes; safe under vmap/jit.
    """
    xn = _normalize_2d(p2d, K)                             # (N, 2)
    wsum = jnp.sum(w) + _EPS

    # --- control points: weighted centroid + axes ---
    c0 = jnp.sum(p3d * w[:, None], axis=0) / wsum
    Xc = p3d - c0
    if use_eigh:
        # principal axes scaled by sqrt eigenvalue (best conditioning)
        cov = (Xc * w[:, None]).T @ Xc / wsum
        eval_, evec = jnp.linalg.eigh(cov)                 # ascending
        s = jnp.sqrt(jnp.maximum(eval_, 1e-6))
        axes = (evec * s[None]).T
    else:
        # hypothesis fast path: axis-aligned control simplex scaled by the
        # cloud's RMS radius -- EPnP only needs a non-degenerate basis, and
        # this avoids a second per-hypothesis eigh
        s = jnp.sqrt(jnp.maximum(jnp.sum(Xc * Xc * w[:, None]) / (3 * wsum), 1e-6))
        axes = jnp.eye(3) * s
    ctrl_w = jnp.concatenate([c0[None], c0[None] + axes], axis=0)  # (4,3)

    # --- barycentric coordinates (closed-form 3x3 inverse: adjugate/det is
    # far cheaper on TPU than a pivoted LU solve) ---
    A = (ctrl_w[1:] - ctrl_w[0]).T + jnp.eye(3) * 1e-9     # (3,3)
    a123 = Xc @ _inv3(A).T                                 # (N,3)
    alphas = jnp.concatenate([1.0 - jnp.sum(a123, axis=1, keepdims=True), a123], axis=1)  # (N,4)

    # --- M^T M (12x12) built directly (avoids materializing 2N x 12) ---
    # rows: sum_j alpha_ij * [1,0,-x_i] and [0,1,-y_i] blocks
    aw = alphas * w[:, None]
    x, y = xn[:, 0], xn[:, 1]
    # M row pair for point i, control j: r1 = a_ij*(1,0,-x_i), r2 = a_ij*(0,1,-y_i)
    # MtM[3j:3j+3, 3k:3k+3] = sum_i a_ij a_ik * [[1,0,-x],[0,1,-y],[-x,-y,x^2+y^2]]
    G = jnp.stack([
        jnp.ones_like(x), jnp.zeros_like(x), -x,
        jnp.zeros_like(x), jnp.ones_like(x), -y,
        -x, -y, x * x + y * y,
    ], axis=-1).reshape(-1, 3, 3)                          # (N,3,3)
    AAT = jnp.einsum("ni,nk->nik", aw, alphas)             # (N,4,4)
    MtM = jnp.einsum("njk,nab->jakb", AAT, G).reshape(12, 12)

    # --- null-space: smallest eigenvector ---
    # inverse iteration converges in 1-2 steps here: the null eigenvalue is
    # ~0 vs O(1) for the rest, so each solve amplifies the null component by
    # ~1e6. MtM is SPD after regularization, so the factorization is a
    # Cholesky -- no pivoting, far cheaper on TPU than LU. With use_eigh the
    # start vector comes from eigh (belt+braces for the final polish);
    # otherwise a fixed start avoids eigh entirely.
    A_reg = MtM + 1e-6 * jnp.eye(12)
    cf = jax.scipy.linalg.cho_factor(A_reg)
    if use_eigh:
        _, V = jnp.linalg.eigh(MtM)
        v1 = jax.scipy.linalg.cho_solve(cf, V[:, 0])
    else:
        v1 = jnp.ones(12) / jnp.sqrt(12.0)
        for _ in range(2):
            v1 = jax.scipy.linalg.cho_solve(cf, v1)
            v1 = v1 / (jnp.linalg.norm(v1) + _EPS)
        v1 = jax.scipy.linalg.cho_solve(cf, v1)
    v1 = v1 / (jnp.linalg.norm(v1) + _EPS)
    v = v1.reshape(4, 3)                                   # candidate ctrl_c up to scale

    # --- scale (beta, case N=1): match inter-control-point distances ---
    iu = jnp.array([0, 0, 0, 1, 1, 2])
    iv = jnp.array([1, 2, 3, 2, 3, 3])
    dc = jnp.linalg.norm(v[iu] - v[iv], axis=1)
    dw = jnp.linalg.norm(ctrl_w[iu] - ctrl_w[iv], axis=1)
    beta = jnp.sum(dc * dw) / (jnp.sum(dc * dc) + _EPS)
    ctrl_c = beta * v

    # points in camera frame; flip if behind the camera
    pc = alphas @ ctrl_c                                   # (N,3)
    zmean = jnp.sum(pc[:, 2] * w) / wsum
    pc = pc * jnp.sign(zmean + _EPS)

    R, t = _weighted_kabsch(p3d, pc, w, use_eigh=use_eigh)
    return R, t


@_full_precision
def reproj_errors(R, t, p3d, p2d, K):
    """Per-point pixel reprojection error (N,)."""
    pc = p3d @ R.T + t[None]
    z = jnp.maximum(pc[:, 2], 1e-6)
    u = K[0, 0] * pc[:, 0] / z + K[0, 2]
    v = K[1, 1] * pc[:, 1] / z + K[1, 2]
    return jnp.sqrt((u - p2d[:, 0]) ** 2 + (v - p2d[:, 1]) ** 2)


@_full_precision
def refine_pose_gn(R, t, p3d, p2d, K, w, iters: int = 8, damping: float = 1e-5,
                   n_backtrack: int = 3):
    """Fixed-iteration damped Gauss-Newton on SE(3), weighted reprojection.

    Left-multiplicative update R <- exp(omega) R, t <- t + dt. Static loop
    bounds; safe under vmap/jit.

    Conditioning: the model points are re-centered at their weighted centroid
    (t absorbs R @ centroid), which decorrelates the rotation and translation
    blocks of the normal matrix -- without this, f32 GN stalls on a flat
    screw-direction valley ~1-2 deg from the optimum.
    """
    fx, fy = K[0, 0], K[1, 1]
    pbar = jnp.sum(p3d * w[:, None], axis=0) / (jnp.sum(w) + _EPS)
    p3d = p3d - pbar
    t = t + R @ pbar

    def step(carry, _):
        R, t = carry
        pc = p3d @ R.T + t[None]
        z = jnp.maximum(pc[:, 2], 1e-6)
        u = fx * pc[:, 0] / z + K[0, 2]
        v = fy * pc[:, 1] / z + K[1, 2]
        r = jnp.stack([u - p2d[:, 0], v - p2d[:, 1]], axis=-1)   # (N,2)
        # du/dpc (N,2,3)
        zero = jnp.zeros_like(z)
        J_pc = jnp.stack([
            jnp.stack([fx / z, zero, -fx * pc[:, 0] / z ** 2], -1),
            jnp.stack([zero, fy / z, -fy * pc[:, 1] / z ** 2], -1),
        ], axis=1)
        # dpc/domega = -skew(R p + t - t) = -skew(R p); dpc/dt = I
        Rp = pc - t[None]
        skew = jnp.zeros((p3d.shape[0], 3, 3))
        skew = skew.at[:, 0, 1].set(-Rp[:, 2]).at[:, 0, 2].set(Rp[:, 1])
        skew = skew.at[:, 1, 0].set(Rp[:, 2]).at[:, 1, 2].set(-Rp[:, 0])
        skew = skew.at[:, 2, 0].set(-Rp[:, 1]).at[:, 2, 1].set(Rp[:, 0])
        J_w = -jnp.einsum("nij,njk->nik", J_pc, skew)            # (N,2,3)
        J = jnp.concatenate([J_w, J_pc], axis=-1)                # (N,2,6)
        Jw = J * w[:, None, None]
        H = jnp.einsum("nij,nik->jk", Jw, J)
        # light Marquardt damping only -- the screw-direction valley of this
        # problem has eigenvalue ~1e0 vs diag ~1e5, so heavy damping freezes
        # exactly the direction that needs descending; the monotone candidate
        # selection below guards against overshoot instead
        H = H + damping * jnp.diag(jnp.diag(H)) + 1e-9 * jnp.eye(6)
        g = jnp.einsum("nij,ni->j", Jw, r)
        # H is SPD (damped Gauss-Newton normal matrix): Cholesky, not LU
        delta = -jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(H), g)

        # monotone step: try delta, delta/2, delta/4, and no-step; keep best
        def cost(Rc, tc):
            e = reproj_errors(Rc, tc, p3d, p2d, K)
            return jnp.sum(e * e * w)

        def apply(scale):
            d = delta * scale
            return rodrigues(d[:3]) @ R, t + d[3:]

        # n_backtrack halving candidates + no-step; fewer candidates = lower
        # sequential latency (the solver is op-count-bound, not FLOP-bound)
        scales = tuple(0.5 ** i for i in range(n_backtrack))
        cands = [apply(s) for s in scales] + [(R, t)]
        costs = jnp.stack([cost(Rc, tc) for Rc, tc in cands])
        best = jnp.argmin(costs)
        R_new = jnp.stack([c[0] for c in cands])[best]
        t_new = jnp.stack([c[1] for c in cands])[best]
        return (R_new, t_new), None

    (R, t), _ = jax.lax.scan(step, (R, t), None, length=iters)
    # repeated f32 exp-map updates accumulate orthogonality drift (~1e-3 over
    # tens of products); project back to SO(3)
    R = project_so3(R)
    return R, t - R @ pbar


@_full_precision
def project_so3(M: jnp.ndarray) -> jnp.ndarray:
    """Nearest rotation matrix (Frobenius) to a near-rotation M.

    Maximizing tr(R^T M) is the same Procrustes objective as Kabsch with
    cross-covariance M, so we reuse Horn's quaternion form (f32 SVD is
    unreliable here because M's singular values are all ~1).

    Horn's N built from S[a,b] solves max tr(R S); the nearest rotation to M
    solves max tr(R^T M) = max tr(R M^T), hence S = M^T."""
    N = _horn_matrix(M.T)
    _, evecs = jnp.linalg.eigh(N)
    return quat_to_rot(evecs[:, -1])
