import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.eval import bop_scores as B


def _rot_z(deg):
    a = np.radians(deg)
    return np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
                     [0, 0, 1.0]], np.float32)


K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float32)


def test_mssd_identity_sym():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (64, 3)).astype(np.float32)
    sym_R = np.eye(3, dtype=np.float32)[None]
    sym_t = np.zeros((1, 3), np.float32)
    R, t = _rot_z(5), np.array([0, 0, 400], np.float32)
    e = float(B.mssd(jnp.asarray(R), jnp.asarray(t), jnp.eye(3),
                     jnp.asarray(t), jnp.asarray(pts), jnp.asarray(sym_R),
                     jnp.asarray(sym_t)))
    # max distance >= mean distance; compare to brute force
    pe = pts @ R.T + t
    pg = pts + t
    ref = np.linalg.norm(pe - pg, axis=1).max()
    np.testing.assert_allclose(e, ref, rtol=1e-4)


def test_mssd_symmetry_reduces_error():
    """A 90-deg z-rotation of a 4-fold-symmetric object scores ~0 under its
    symmetry set."""
    ang = np.linspace(0, 2 * np.pi, 4, endpoint=False)
    base = np.stack([np.cos(ang) * 30, np.sin(ang) * 30, np.linspace(-10, 10, 4)], -1)
    pts = np.concatenate([base, base * 0.5]).astype(np.float32)
    pts[:, 2] = np.abs(pts[:, 2])  # keep z asymmetric only mildly
    sym_R = np.stack([np.eye(3, dtype=np.float32), _rot_z(90), _rot_z(180), _rot_z(270)])
    sym_t = np.zeros((4, 3), np.float32)
    t = np.array([0, 0, 400], np.float32)
    e_sym = float(B.mssd(jnp.asarray(_rot_z(90)), jnp.asarray(t), jnp.eye(3),
                         jnp.asarray(t), jnp.asarray(pts), jnp.asarray(sym_R),
                         jnp.asarray(sym_t)))
    e_nosym = float(B.mssd(jnp.asarray(_rot_z(90)), jnp.asarray(t), jnp.eye(3),
                           jnp.asarray(t), jnp.asarray(pts),
                           jnp.asarray(sym_R[:1]), jnp.asarray(sym_t[:1])))
    assert e_sym < 1e-2 and e_nosym > 10.0


def test_mspd_pixels():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-30, 30, (64, 3)).astype(np.float32)
    sym_R = np.eye(3, dtype=np.float32)[None]
    sym_t = np.zeros((1, 3), np.float32)
    t = np.array([0, 0, 400], np.float32)
    t2 = t + np.array([2, 0, 0], np.float32)  # 2mm x-shift ~ 2*572/400 ~ 2.9 px
    e = float(B.mspd(jnp.eye(3), jnp.asarray(t2), jnp.eye(3), jnp.asarray(t),
                     jnp.asarray(K), jnp.asarray(pts), jnp.asarray(sym_R),
                     jnp.asarray(sym_t)))
    assert 2.0 < e < 4.0


def test_average_recall():
    d = 100.0
    mssd_errs = np.array([1.0, 10.0, 200.0])   # 1%, 10%, 200% of diameter
    mspd_errs = np.array([1.0, 10.0, 500.0])   # px
    out = B.bop19_average_recall(mssd_errs, mspd_errs, d)
    # mssd: err1 passes all 10 ths; err2 passes ths>=0.15 (8/10); err3 none
    assert abs(out["ar_mssd"] - (10 + 8 + 0) / 30) < 1e-6
    # mspd: err1 passes all; err2 passes all 10 (>=10 is th=10..50? 10<10 false -> 9); err3 none
    assert 0.5 < out["ar_mspd"] < 0.7
    assert out["ar"] == 0.5 * (out["ar_mssd"] + out["ar_mspd"])


def test_csv_check_and_load(tmp_path):
    from checkerpose_tpu.eval.csv_writer import write_csv
    p = write_csv(str(tmp_path), "r", 3, [1], [2], [np.eye(3)], [np.ones(3)], [0.9])
    assert B.check_bop_results_csv(p) == []
    rows = B.load_bop_results_csv(p)
    assert rows[0]["obj_id"] == 3 and rows[0]["R"].shape == (3, 3)
    bad = tmp_path / "bad.csv"
    bad.write_text("scene_id,im_id,obj_id,score,R,t,time\n1,2,3,0.5,1 2 3,4 5 6,-1\n")
    assert B.check_bop_results_csv(str(bad))  # R has 3 values -> problem


def test_sym_arrays_cap():
    info = {"diameter": 100.0,
            "symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    R, t = B.sym_arrays(info, max_sym_disc_step=0.01, max_syms=16)
    assert R.shape == (16, 3, 3)
    np.testing.assert_array_equal(R[0], np.eye(3, dtype=np.float32))
