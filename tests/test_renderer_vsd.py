"""Depth renderer + VSD (closes the last SURVEY §2.2 'no' row)."""
import numpy as np
import pytest

from checkerpose_tpu.eval.renderer import render_depth
from checkerpose_tpu.eval.bop_scores import vsd_error, depth_to_dist, VSD_TAUS

K = np.array([[572.4, 0.0, 325.26], [0.0, 573.57, 242.05], [0.0, 0.0, 1.0]])


def _cube(side=60.0):
    """Axis-aligned cube mesh centered at origin (12 triangles)."""
    s = side / 2.0
    v = np.array([[x, y, z] for x in (-s, s) for y in (-s, s) for z in (-s, s)],
                 np.float64)
    f = np.array([
        [0, 1, 3], [0, 3, 2],  # x = -s
        [4, 6, 7], [4, 7, 5],  # x = +s
        [0, 4, 5], [0, 5, 1],  # y = -s
        [2, 3, 7], [2, 7, 6],  # y = +s
        [0, 2, 6], [0, 6, 4],  # z = -s
        [1, 5, 7], [1, 7, 3],  # z = +s
    ], np.int32)
    return v, f


def test_render_depth_frontal_cube():
    v, f = _cube(60.0)
    t = np.array([0.0, 0.0, 400.0])
    d = render_depth(v, f, np.eye(3), t, K)
    assert d.shape == (480, 640)
    # center pixel sees the front face at z = 400 - 30
    cy, cx = int(K[1, 2]), int(K[0, 2])
    assert abs(d[cy, cx] - 370.0) < 1.0
    # background is zero and the silhouette is about the projected square
    assert d[0, 0] == 0.0
    px_side = 572.4 * 60.0 / 370.0
    area = (d > 0).sum()
    assert abs(area - px_side ** 2) / px_side ** 2 < 0.08


def test_render_depth_zbuffer_orders_surfaces():
    """Two cubes merged into one mesh: the near one must win the z-buffer."""
    v1, f1 = _cube(60.0)
    v2, f2 = _cube(60.0)
    v2 = v2 + np.array([0.0, 0.0, 120.0])  # same silhouette, behind
    v = np.vstack([v1, v2])
    f = np.vstack([f1, f2 + 8])
    d = render_depth(v, f, np.eye(3), np.array([0.0, 0.0, 400.0]), K)
    cy, cx = int(K[1, 2]), int(K[0, 2])
    assert abs(d[cy, cx] - 370.0) < 1.0  # near cube, not 490


def test_render_depth_rotation_changes_depth():
    v, f = _cube(60.0)
    R = np.array([[np.cos(0.5), 0, np.sin(0.5)], [0, 1, 0],
                  [-np.sin(0.5), 0, np.cos(0.5)]])
    d = render_depth(v, f, R, np.array([0.0, 0.0, 400.0]), K)
    assert (d > 0).any()
    assert d[d > 0].min() < 370.5  # rotated cube corner comes closer


def test_vsd_zero_for_gt_pose_and_positive_when_off():
    v, f = _cube(60.0)
    R = np.eye(3)
    t = np.array([0.0, 0.0, 400.0])
    depth_test = render_depth(v, f, R, t, K)  # scene == object at GT
    errs_gt = vsd_error(R, t, R, t, depth_test, K, v, f, diameter=60.0 * 3 ** 0.5)
    assert len(errs_gt) == len(VSD_TAUS)
    assert max(errs_gt) < 0.02  # exact pose -> ~0 at every tau

    t_off = t + np.array([0.0, 0.0, 40.0])  # 40mm off, diameter ~104mm
    errs_off = vsd_error(R, t_off, R, t, depth_test, K, v, f,
                         diameter=60.0 * 3 ** 0.5)
    assert errs_off[0] > 0.5          # tau = 0.05*d ~ 5mm: most pixels wrong
    assert errs_off[-1] < errs_off[0]  # monotone in tau
    assert all(0.0 <= e <= 1.0 for e in errs_off)


def test_vsd_occlusion_excluded():
    """Pixels occluded in the scene must not count against the estimate."""
    v, f = _cube(60.0)
    R = np.eye(3)
    t = np.array([0.0, 0.0, 400.0])
    depth_test = render_depth(v, f, R, t, K)
    # occluder covering the left half of the image at z=200
    occ = depth_test.copy()
    occ[:, :320] = 200.0
    errs = vsd_error(R, t, R, t, occ, K, v, f, diameter=60.0 * 3 ** 0.5)
    assert max(errs) < 0.02  # still correct: occluded part invisible for both


def test_depth_to_dist_center_equals_depth():
    d = np.zeros((480, 640), np.float32)
    cy, cx = int(K[1, 2]), int(K[0, 2])
    d[cy, cx] = 500.0
    d[0, 0] = 500.0
    dist = depth_to_dist(d, K)
    assert abs(dist[cy, cx] - 500.0) < 0.5   # on-axis: dist == depth
    assert dist[0, 0] > 560.0                # corner ray is longer


def test_load_ply_mesh_roundtrip(tmp_path):
    from checkerpose_tpu.data.ply import save_ply_vertices, load_ply_mesh
    v, f = _cube(10.0)
    p = tmp_path / "cube.ply"
    save_ply_vertices(str(p), v, f)
    v2, f2 = load_ply_mesh(str(p))
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_eval_bop_includes_vsd(tmp_path):
    """eval_bop on a faced-mesh fixture with depth images: GT poses must get
    AR ~ 1.0 including the VSD component."""
    from checkerpose_tpu.data.synthetic import make_synthetic_bop
    from checkerpose_tpu.data.bop_io import scan_bop_object
    from checkerpose_tpu.cli.eval_bop import main as eval_main

    root = str(tmp_path)
    make_synthetic_bop(root, n_objects=1, n_scenes=1, n_images=4,
                       folders=("test",), n_vertices=96)
    samples = scan_bop_object(root, "synth", "test", 1, 0.1)
    csv = tmp_path / "res.csv"
    with open(csv, "w") as f:
        f.write("scene_id,im_id,obj_id,score,R,t,time\n")
        for s in samples:
            Rs = " ".join(f"{x:.8f}" for x in s.R.reshape(-1))
            ts = " ".join(f"{x:.8f}" for x in s.t)
            f.write(f"{s.scene_id},{s.im_id},1,1.0,{Rs},{ts},0.1\n")
    report = eval_main(str(csv), root, "synth")
    assert "ar_vsd" in report["per_object"][1], report["note"]
    assert report["per_object"][1]["ar_vsd"] > 0.95
    assert report["overall"]["ar"] > 0.95
