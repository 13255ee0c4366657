"""On-device depth rasterizer (ops/raster.py) vs the CPU golden
(eval/renderer.py::render_depth, itself cross-checked against the official
bop_toolkit renderer in tests/test_renderer_golden.py)."""
import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.eval.renderer import render_depth
from checkerpose_tpu.ops.raster import render_depth_crops

K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float64)


def icosphere(r=40.0, n=12):
    """Low-poly UV sphere mesh (closed, outward normals irrelevant here)."""
    th = np.linspace(0, np.pi, n)
    ph = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    T, P = np.meshgrid(th, ph, indexing="ij")
    V = np.stack([r * np.sin(T) * np.cos(P), r * np.sin(T) * np.sin(P),
                  r * np.cos(T)], -1).reshape(-1, 3)
    F = []
    for i in range(n - 1):
        for j in range(2 * n):
            a = i * 2 * n + j
            b = i * 2 * n + (j + 1) % (2 * n)
            c = a + 2 * n
            d = b + 2 * n
            F += [[a, b, c], [b, d, c]]
    return V.astype(np.float32), np.asarray(F, np.int32)


def rand_pose(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = np.array([rng.uniform(-30, 30), rng.uniform(-30, 30),
                  rng.uniform(350, 550)])
    return Q, t


def crop_K(Kf, b, S):
    return np.array([[Kf[0, 0] * S / b[2], 0, (Kf[0, 2] - b[0]) * S / b[2]],
                     [0, Kf[1, 1] * S / b[3], (Kf[1, 2] - b[1]) * S / b[3]],
                     [0, 0, 1.0]])


def test_raster_matches_cpu_golden():
    verts, faces = icosphere()
    rng = np.random.default_rng(0)
    S = 64
    B = 3
    Rs, ts, bbs = [], [], []
    for _ in range(B):
        Q, t = rand_pose(rng)
        uv = (verts @ Q.T + t)
        uv = (uv[:, :2] / uv[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        x0, y0 = uv.min(0) - 8
        side = float(max(*(uv.max(0) - uv.min(0) + 16)))
        Rs.append(Q), ts.append(t), bbs.append([x0, y0, side, side])
    Rs, ts, bbs = map(np.asarray, (Rs, ts, bbs))

    got = np.asarray(render_depth_crops(
        verts, faces, jnp.asarray(Rs, jnp.float32), jnp.asarray(ts, jnp.float32),
        jnp.tile(np.asarray(K, np.float32), (B, 1, 1)),
        jnp.asarray(bbs, jnp.float32), S))

    for i in range(B):
        want = render_depth(verts, faces, Rs[i], ts[i],
                            crop_K(K, bbs[i], S), S, S)
        hit_g, hit_w = got[i] > 0, want > 0
        # coverage: edge pixels may disagree (float edge ties), interiors not
        assert (hit_g ^ hit_w).mean() < 0.02, (hit_g.sum(), hit_w.sum())
        both = hit_g & hit_w
        assert both.sum() > 200
        err = np.abs(got[i][both] - want[both]) / want[both]
        assert np.quantile(err, 0.99) < 5e-3  # front-surface z agreement


def test_raster_dummy_bbox_safe():
    verts, faces = icosphere(n=6)
    out = np.asarray(render_depth_crops(
        verts, faces, jnp.eye(3)[None], jnp.asarray([[0., 0., 400.]]),
        jnp.asarray(K, jnp.float32)[None], jnp.zeros((1, 4), jnp.float32), 16))
    assert np.isfinite(out).all()


def test_raster_occlusion_front_surface():
    """Two stacked quads: the rasterized depth must be the NEARER one."""
    verts = np.array([[-20, -20, 0], [20, -20, 0], [20, 20, 0], [-20, 20, 0],
                      [-20, -20, 30], [20, -20, 30], [20, 20, 30],
                      [-20, 20, 30]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0, 0, 400], np.float32)
    b = np.array([280., 200., 90., 90.], np.float32)
    out = np.asarray(render_depth_crops(
        verts, faces, R[None], t[None], np.asarray(K, np.float32)[None],
        b[None], 32))[0]
    hit = out > 0
    assert hit.sum() > 100
    np.testing.assert_allclose(out[hit], 400.0, rtol=1e-5)
