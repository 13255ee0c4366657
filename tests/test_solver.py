import numpy as np
import jax
import jax.numpy as jnp
import pytest

import functools
import checkerpose_tpu.solver.ransac as _ransac
from checkerpose_tpu.solver import ransac_pnp, solve_poses_batched
from checkerpose_tpu.solver.epnp import epnp as _epnp, refine_pose_gn as _refine, reproj_errors as _reproj

# jit everything (eager dispatch is pathologically slow on this 1-core host)
epnp = jax.jit(_epnp)
refine_pose_gn = jax.jit(functools.partial(_refine, iters=10))
reproj_errors = jax.jit(_reproj)
from checkerpose_tpu.ops.geometry import project_pts

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1.0]], np.float32)


def _scene(seed, n=128, noise=0.0, outlier_frac=0.0, t_z=400.0):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = np.array([rng.uniform(-30, 30), rng.uniform(-30, 30), t_z])
    p3d = rng.uniform(-40, 40, (n, 3))
    uv, _ = project_pts(p3d, K.astype(np.float64), Q, t)
    uv = uv + rng.standard_normal(uv.shape) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        out_idx = rng.choice(n, n_out, replace=False)
        uv[out_idx] += rng.uniform(-80, 80, (n_out, 2))
    return Q, t, p3d.astype(np.float32), uv.astype(np.float32)


def _rot_err_deg(R1, R2):
    cos = (np.trace(R1 @ R2.T) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def test_epnp_exact():
    R, t, p3d, uv = _scene(0)
    Rh, th = epnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.asarray(K),
                  jnp.ones(p3d.shape[0]))
    # f32 EPnP alone: ~1-2 deg / few mm; GN refinement tightens it further
    assert _rot_err_deg(np.asarray(Rh), R) < 2.0
    assert np.linalg.norm(np.asarray(th) - t) < 6.0


def test_epnp_noisy_plus_gn():
    R, t, p3d, uv = _scene(1, noise=1.0)
    w = jnp.ones(p3d.shape[0])
    Rh, th = epnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.asarray(K), w)
    Rh, th = refine_pose_gn(Rh, th, jnp.asarray(p3d), jnp.asarray(uv),
                            jnp.asarray(K), w)
    # f32 noise floor: poses within ~2-3 deg have reprojection SSE equal to
    # the f64 optimum on 1px-noise data (flat screw-direction valley)
    assert _rot_err_deg(np.asarray(Rh), R) < 3.0
    assert np.linalg.norm(np.asarray(th) - t) < 8.0
    errs = np.asarray(reproj_errors(Rh, th, jnp.asarray(p3d), jnp.asarray(uv), jnp.asarray(K)))
    assert np.median(errs) < 2.0


def test_epnp_weighted_ignores_corrupted():
    R, t, p3d, uv = _scene(2)
    uv2 = uv.copy()
    uv2[:32] += 500.0  # corrupt a quarter
    w = np.ones(len(uv2), np.float32)
    w[:32] = 0.0
    Rh, th = epnp(jnp.asarray(p3d), jnp.asarray(uv2), jnp.asarray(K), jnp.asarray(w))
    assert _rot_err_deg(np.asarray(Rh), R) < 3.0  # bare f32 EPnP, no GN


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3])
def test_ransac(outlier_frac):
    R, t, p3d, uv = _scene(3, noise=0.5, outlier_frac=outlier_frac)
    out = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.ones(len(uv)),
                     jnp.asarray(K), jax.random.PRNGKey(0), num_hyp=64)
    assert bool(out["success"])
    assert _rot_err_deg(np.asarray(out["R"]), R) < 3.0
    assert np.linalg.norm(np.asarray(out["t"]) - t) < 8.0
    assert float(out["num_inliers"]) > len(uv) * (1 - outlier_frac) * 0.8


def test_ransac_with_validity_mask():
    R, t, p3d, uv = _scene(4, noise=0.3)
    valid = np.ones(len(uv), np.float32)
    valid[::3] = 0.0
    uv2 = uv.copy()
    uv2[::3] = 0.0  # garbage where invalid
    out = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv2), jnp.asarray(valid),
                     jnp.asarray(K), jax.random.PRNGKey(1), num_hyp=64)
    assert _rot_err_deg(np.asarray(out["R"]), R) < 2.0
    # no invalid point may be counted as inlier
    assert np.asarray(out["inliers"])[::3].max() == 0.0


def test_ransac_too_few_points_identity():
    """Reference returns identity pose with < 4 valid points
    (test_network_with_test_data.py:112-115)."""
    R, t, p3d, uv = _scene(5)
    valid = np.zeros(len(uv), np.float32)
    valid[:3] = 1.0
    out = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.asarray(valid),
                     jnp.asarray(K), jax.random.PRNGKey(2), num_hyp=16)
    assert not bool(out["success"])
    np.testing.assert_array_equal(np.asarray(out["R"]), np.eye(3))
    np.testing.assert_array_equal(np.asarray(out["t"]), np.zeros(3))


def test_batched_solver():
    scenes = [_scene(10 + i, noise=0.5, outlier_frac=0.2) for i in range(4)]
    p3d = jnp.asarray(scenes[0][2])  # shared keypoints
    uv = jnp.asarray(np.stack([s[3] for s in scenes]))
    # make scene i use p3d of scene 0 so re-project consistently:
    uvs = []
    for s in scenes:
        R, t = s[0], s[1]
        u, _ = project_pts(np.asarray(p3d, np.float64), K.astype(np.float64), R, t)
        uvs.append(u)
    uv = jnp.asarray(np.stack(uvs).astype(np.float32))
    out = solve_poses_batched(p3d, uv, jnp.ones(uv.shape[:2]), jnp.asarray(K),
                              jax.random.PRNGKey(3), num_hyp=64)
    for i, s in enumerate(scenes):
        assert _rot_err_deg(np.asarray(out["R"][i]), s[0]) < 1.5


@pytest.mark.parametrize("outlier_frac", [0.0, 0.3])
def test_ransac_fast_profile(outlier_frac):
    """Low-latency profile (no EPnP re-seed, 2 backtrack candidates, 5 GN
    iters) must match the default profile's accuracy bounds: the reseed only
    rescues a poor best hypothesis and the extra GN iterations/candidates
    polish inside the f32 noise floor (BENCH.md solver notes)."""
    R, t, p3d, uv = _scene(3, noise=0.5, outlier_frac=outlier_frac)
    out = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.ones(len(uv)),
                     jnp.asarray(K), jax.random.PRNGKey(0), num_hyp=64,
                     refine_iters=5, reseed=False, n_backtrack=2)
    assert bool(out["success"])
    assert _rot_err_deg(np.asarray(out["R"]), R) < 3.0
    assert np.linalg.norm(np.asarray(out["t"]) - t) < 8.0
    assert float(out["num_inliers"]) > len(uv) * (1 - outlier_frac) * 0.8


def test_soft_inlier_mode():
    """Progressive-X-equivalent soft scoring still recovers the pose."""
    R, t, p3d, uv = _scene(20, noise=0.5, outlier_frac=0.3)
    out = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.ones(len(uv)),
                     jnp.asarray(K), jax.random.PRNGKey(4), num_hyp=64,
                     soft_inlier_sigma=0.5)
    assert _rot_err_deg(np.asarray(out["R"]), R) < 3.0


def test_spatial_coherence_mode():
    """Prog-X spatial-coherence analog: inlier weights diffuse over the 2D
    neighborhood graph (ball radius 20 px, weight 0.1 -- the reference's
    find6DPoses params, CNN_output_to_pose.py:262-273)."""
    R, t, p3d, uv = _scene(21, noise=0.5, outlier_frac=0.3)
    out = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.ones(len(uv)),
                     jnp.asarray(K), jax.random.PRNGKey(5), num_hyp=64,
                     soft_inlier_sigma=0.5, coherence_weight=0.1)
    assert _rot_err_deg(np.asarray(out["R"]), R) < 3.0
    assert np.linalg.norm(np.asarray(out["t"]) - t) < 8.0


def test_spatial_coherence_smooths_isolated_outlier():
    """A clean point whose only fault is a just-over-threshold residual gets
    pulled back by coherent neighbors: its final weight under coherence must
    exceed its (0) hard-inlier weight, while far-off outliers stay rejected."""
    R, t, p3d, uv = _scene(22, noise=0.0, outlier_frac=0.0, t_z=420.0)
    uv = uv.copy()
    uv[7] += 2.5  # marginal: just past the 2 px threshold
    uv[11] += 60.0  # gross outlier
    out_hard = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.ones(len(uv)),
                          jnp.asarray(K), jax.random.PRNGKey(6), num_hyp=64)
    out_coh = ransac_pnp(jnp.asarray(p3d), jnp.asarray(uv), jnp.ones(len(uv)),
                         jnp.asarray(K), jax.random.PRNGKey(6), num_hyp=64,
                         coherence_weight=0.1)
    # both reject the gross outlier and recover the pose
    assert not bool(out_hard["inliers"][11]) and not bool(out_coh["inliers"][11])
    assert _rot_err_deg(np.asarray(out_coh["R"]), R) < 1.0


def test_degenerate_collapsed_points_fail_cleanly():
    """All correspondences on one pixel -> EPnP/GN may NaN; the solve must
    report success=False with the identity fallback, never a NaN pose."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from checkerpose_tpu.solver.ransac import solve_poses_batched

    rng = np.random.default_rng(3)
    p3d = jnp.asarray(rng.uniform(-30, 30, (16, 3)), jnp.float32)
    p2d = jnp.broadcast_to(jnp.asarray([160.0, 120.0]), (2, 16, 2))
    valid = jnp.ones((2, 16), jnp.float32)
    K = jnp.asarray([[570.0, 0, 160], [0, 570.0, 120], [0, 0, 1]], jnp.float32)
    sol = solve_poses_batched(p3d, p2d, valid, K, jax.random.PRNGKey(0),
                              num_hyp=16)
    assert np.isfinite(np.asarray(sol["R"])).all()
    assert np.isfinite(np.asarray(sol["t"])).all()
