import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.ops import geometry


def _rand_pose(rng):
    # random rotation via QR
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = np.array([10.0, -5.0, 400.0]) + rng.standard_normal(3)
    return Q, t


K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1.0]])


def test_project_parity_with_reference_formula():
    """Reference builds P = K [R|t] and divides by depth
    (bop_dataset_pytorch.py:21-36)."""
    rng = np.random.default_rng(0)
    R, t = _rand_pose(rng)
    pts = rng.standard_normal((100, 3)) * 50
    uv, depth = geometry.project_pts(pts, K, R, t)
    P = K.dot(np.hstack((R, t.reshape(3, 1))))
    pts_h = np.hstack((pts, np.ones((100, 1))))
    pim = P.dot(pts_h.T)
    ref_depth = pim[2].copy()
    pim = pim / pim[2]
    np.testing.assert_allclose(uv, pim[:2].T, rtol=1e-9)
    np.testing.assert_allclose(depth, ref_depth, rtol=1e-9)


def test_pc_normalize():
    rng = np.random.default_rng(1)
    pc = rng.standard_normal((64, 3)) * 30 + 5
    out = geometry.pc_normalize(pc)
    assert np.abs(out.mean(0)).max() < 1e-9 + np.abs(out).max()
    np.testing.assert_allclose(np.linalg.norm(out, axis=1).max(), 1.0, rtol=1e-9)


def test_bbox_ops():
    bbox = np.array([10, 20, 30, 50])  # x y w h, taller than wide
    sq = geometry.square_bbox(bbox)
    assert sq[2] == sq[3]
    # center preserved (up to int truncation)
    assert abs((sq[0] + sq[2] / 2) - 25) <= 1
    padded = geometry.padding_bbox(bbox, 1.5)
    assert padded[2] == int(30 * 1.5) and padded[3] == int(50 * 1.5)

    clipped = geometry.clip_bbox(np.array([-5, -5, 30, 30]), 100, 100)
    assert clipped[0] == 0 and clipped[1] == 0 and clipped[2] == 25


def test_map_crop_to_original_roundtrip():
    bbox = np.array([12, 34, 128, 128], dtype=np.float64)
    grid = geometry.roi_grid(64)
    ori = geometry.map_crop_to_original(grid, bbox, 64)
    assert ori[0, 0, 0] == 12 and ori[0, 0, 1] == 34
    assert ori[0, 1, 0] == 12 + 2  # 128/64 = 2 px per cell


def test_make_code_labels_matches_reference_semantics():
    """Mirror the reference GT-gen math (bop_dataset_pytorch.py:356-373) in
    numpy and compare to the jitted version."""
    rng = np.random.default_rng(2)
    S = 64
    bbox = np.array([50, 60, 130, 130], dtype=np.float64)
    proj = np.stack([
        rng.uniform(20, 220, size=500),
        rng.uniform(30, 230, size=500),
    ], axis=1)

    # reference math
    pxs = bbox[2] / S
    pys = bbox[3] / S
    out1 = np.logical_or(proj[:, 0] < bbox[0], proj[:, 1] < bbox[1])
    x_id = ((proj[:, 0] - bbox[0]) / pxs).astype(int)
    y_id = ((proj[:, 1] - bbox[1]) / pys).astype(int)
    out2 = np.logical_or(x_id >= S, y_id >= S)
    out = np.logical_or(out1, out2)
    ref_bit = (~out).astype(np.float32)
    ref_x = np.clip(x_id, 0, S - 1)
    ref_y = np.clip(y_id, 0, S - 1)

    bit, xi, yi = geometry.make_code_labels(jnp.asarray(proj), jnp.asarray(bbox), S)
    np.testing.assert_array_equal(np.asarray(bit), ref_bit)
    np.testing.assert_array_equal(np.asarray(xi), ref_x)
    np.testing.assert_array_equal(np.asarray(yi), ref_y)


def test_fps():
    rng = np.random.default_rng(3)
    pts = rng.standard_normal((500, 3))
    idx = geometry.farthest_point_sample(pts, 16)
    assert len(np.unique(idx)) == 16
    # FPS picks spread-out points: min pairwise distance should beat random
    sel = pts[idx]
    d = np.linalg.norm(sel[:, None] - sel[None, :], axis=-1)
    d += np.eye(16) * 1e9
    rnd = pts[rng.choice(500, 16, replace=False)]
    dr = np.linalg.norm(rnd[:, None] - rnd[None, :], axis=-1) + np.eye(16) * 1e9
    assert d.min() > dr.min()
