import os

import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.eval import metrics as M
from checkerpose_tpu.eval.decode import ids_to_correspondences
from checkerpose_tpu.eval.csv_writer import write_csv, merge_csv


def _rot(axis, deg):
    k = np.asarray(axis, np.float64)
    k /= np.linalg.norm(k)
    a = np.radians(deg)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)


def test_add_error_formula():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (100, 3))
    R1, t1 = _rot([0, 0, 1], 5), np.array([0., 0., 400.])
    R2, t2 = np.eye(3), np.array([1., 2., 398.])
    out = float(M.add_error(jnp.asarray(R1), jnp.asarray(t1), jnp.asarray(R2),
                            jnp.asarray(t2), jnp.asarray(pts)))
    ref = np.linalg.norm((pts @ R1.T + t1) - (pts @ R2.T + t2), axis=1).mean()
    np.testing.assert_allclose(out, ref, rtol=2e-3)  # jnp computes in f32


def test_adi_matches_brute_force():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-30, 30, (700, 3)).astype(np.float32)  # not chunk-aligned
    R1, t1 = _rot([0, 1, 0], 20), np.array([3., -2., 420.])
    R2, t2 = _rot([0, 1, 0], -15), np.array([0., 0., 400.])
    out = float(jax.jit(M.adi_error)(jnp.asarray(R1, jnp.float32), jnp.asarray(t1, jnp.float32),
                                     jnp.asarray(R2, jnp.float32), jnp.asarray(t2, jnp.float32),
                                     jnp.asarray(pts)))
    pe = pts @ R1.T + t1
    pg = pts @ R2.T + t2
    d = np.linalg.norm(pg[:, None] - pe[None], axis=-1).min(axis=1).mean()
    np.testing.assert_allclose(out, d, rtol=1e-3)


def test_adi_symmetric_invariance():
    """ADI of a rotationally-symmetric ring under its symmetry rotation ~ 0."""
    ang = np.linspace(0, 2 * np.pi, 64, endpoint=False)
    ring = np.stack([np.cos(ang) * 30, np.sin(ang) * 30, np.zeros(64)], -1).astype(np.float32)
    Rsym = _rot([0, 0, 1], 360 / 64)
    t = np.array([0., 0., 400.])
    out = float(jax.jit(M.adi_error)(jnp.asarray(Rsym, jnp.float32), jnp.asarray(t, jnp.float32),
                                     jnp.eye(3), jnp.asarray(t, jnp.float32),
                                     jnp.asarray(ring)))
    add = float(M.add_error(jnp.asarray(Rsym, jnp.float32), jnp.asarray(t, jnp.float32),
                            jnp.eye(3, dtype=jnp.float32), jnp.asarray(t, jnp.float32),
                            jnp.asarray(ring)))
    assert out < 0.01 and add > 1.0


def test_re_te():
    R = _rot([1, 0, 0], 10)
    assert abs(float(M.re_error(jnp.asarray(R), jnp.eye(3))) - 10.0) < 1e-4
    assert abs(float(M.te_error(jnp.asarray([1., 2., 2.]), jnp.zeros(3))) - 3.0) < 1e-6


def test_auc_posecnn():
    # all perfect -> 1.0; all beyond cutoff -> nan-ish/zero
    assert abs(M.compute_auc_posecnn(np.zeros(10) + 1e-6) - 1.0) < 0.01
    assert M.compute_auc_posecnn(np.full(10, 0.05)) < 0.6


def test_symmetry_transformations():
    info = {"diameter": 100.0,
            "symmetries_discrete": [list(np.eye(4).reshape(-1))],
            "symmetries_continuous": [{"axis": [0, 0, 1], "offset": [0, 0, 0]}]}
    syms = M.symmetry_transformations(info, max_sym_disc_step=0.3)
    assert len(syms) > 5
    Rs = np.stack([s[0] for s in syms])
    err = M.closest_symmetric_rot_error(_rot([0, 0, 1], 33), np.eye(3), Rs)
    assert float(err) < 30.0  # much closer than the raw 33 deg


def test_ids_to_correspondences():
    B, N, S = 2, 8, 64
    x_id = jnp.asarray(np.tile(np.arange(8), (B, 1)))
    y_id = jnp.asarray(np.tile(np.arange(8)[::-1].copy(), (B, 1)))
    roi = jnp.ones((B, N))
    bbox = jnp.asarray(np.tile(np.array([100., 50., 128., 128.]), (B, 1)))
    p2d, valid = ids_to_correspondences(x_id, y_id, roi, bbox, crop_size_gt=S)
    assert float(p2d[0, 0, 0]) == 100.0  # id 0 -> bbox x
    assert float(p2d[0, 1, 0]) == 102.0  # 128/64 = 2 px per cell
    np.testing.assert_array_equal(np.asarray(valid), np.ones((B, N)))
    # seg filtering: zero seg kills all
    seg = jnp.zeros((B, S, S))
    _, valid2 = ids_to_correspondences(x_id, y_id, roi, bbox, crop_size_gt=S,
                                       seg_mask=seg, check_seg=True)
    assert float(valid2.sum()) == 0.0
    # boundary discard
    _, valid3 = ids_to_correspondences(x_id, y_id, roi, bbox, crop_size_gt=S,
                                       discard_bd_pixel=3)
    assert np.asarray(valid3)[0, :3].sum() == 0.0  # ids 0,1,2 within margin


def test_csv_writer(tmp_path):
    Rs = [np.eye(3)] * 3
    ts = [np.arange(3.0)] * 3
    p = write_csv(str(tmp_path), "objA", 5, [1, 1, 2], [10, 11, 12], Rs, ts,
                  [1.0, -1, 1.0])
    lines = open(p).read().strip().split("\n")
    assert lines[0] == "scene_id,im_id,obj_id,score,R,t,time"
    assert len(lines) == 3  # one row skipped (score -1)
    fields = lines[1].split(",")
    assert fields[0] == "1" and fields[2] == "5"
    assert len(fields[4].split(" ")) == 9 and len(fields[5].split(" ")) == 3
    p2 = write_csv(str(tmp_path), "objB", 6, [3], [1], [np.eye(3)], [np.ones(3)], [0.5])
    merged = merge_csv([p, p2], str(tmp_path / "merged.csv"))
    lines = open(merged).read().strip().split("\n")
    assert len(lines) == 4 and lines[0].startswith("scene_id")


def test_merge_csv_cli(tmp_path, monkeypatch):
    """CLI parity with reference tools_for_BOP/merge_csv.py: glob *.csv in
    --input_dir, concat into --output_fn (excluding a pre-existing output)."""
    from checkerpose_tpu.cli import merge_csv as cli_merge

    write_csv(str(tmp_path), "objA", 5, [1], [10], [np.eye(3)], [np.ones(3)], [1.0])
    write_csv(str(tmp_path), "objB", 6, [3], [1], [np.eye(3)], [np.ones(3)], [0.5])
    monkeypatch.setattr("sys.argv", ["merge_csv", "--input_dir", str(tmp_path),
                                     "--output_fn", "all.csv"])
    cli_merge.main()
    lines = open(tmp_path / "all.csv").read().strip().split("\n")
    assert len(lines) == 3 and lines[0].startswith("scene_id")
    # idempotent: rerunning must not fold the previous output into itself
    cli_merge.main()
    lines = open(tmp_path / "all.csv").read().strip().split("\n")
    assert len(lines) == 3


# ---------------------------------------------------------------------------
# official BOP19 matching (pose_matching.py semantics), round-2 item 6
# ---------------------------------------------------------------------------

def test_official_matching_two_instance_scene():
    from checkerpose_tpu.eval.bop_scores import (match_poses_greedy,
                                                 official_average_recall)
    # two GT instances; three estimates. est0 (score .9) fits gt1 well,
    # est1 (score .8) fits gt1 even better but must take gt0 because the
    # higher-scored est0 claimed gt1 first; est2 is junk.
    ests = [
        {"score": 0.9, "errors": {0: 0.30, 1: 0.02}},
        {"score": 0.8, "errors": {0: 0.04, 1: 0.01}},
        {"score": 0.1, "errors": {0: 0.50, 1: 0.60}},
    ]
    m = match_poses_greedy(ests, error_th=0.1, max_ests=0, gt_valid=[True, True])
    assert sorted(m) == [(0, 1), (1, 0)]

    # n_top=1: only the single highest-scored estimate may match
    m1 = match_poses_greedy(ests, error_th=0.1, max_ests=1, gt_valid=[True, True])
    assert m1 == [(0, 1)]

    # invalid GT cannot be matched
    m2 = match_poses_greedy(ests, error_th=0.1, max_ests=0, gt_valid=[False, True])
    assert m2 == [(0, 1)]

    # recall over thresholds: one group, 2 valid targets
    groups = [{"ests": ests, "gt_valid": [True, True], "n_top": 0}]
    ar = official_average_recall(groups, [0.1])
    assert ar == 1.0
    ar_strict = official_average_recall(groups, [0.03])
    # at 0.03 only est0->gt1 (0.02) and est1->gt1 blocked, est1->gt0=0.04 fails
    assert ar_strict == 0.5
    # plain per-estimate recall would have counted est1's 0.01 on gt1 twice;
    # official matching must not
    ar_both = official_average_recall(groups, [0.1, 0.03])
    assert abs(ar_both - 0.75) < 1e-9


def test_rete_pass_rates_thresholds():
    """Hand-built re/te straddling every threshold (reference
    test_lm.py:319-327 semantics: rete2 = re<2 AND te<20, @5 = re<5/te<50;
    failed solves carry re=180/te=inf and must fail everything)."""
    re = np.array([1.9, 1.9, 4.9, 2.0, 5.0, 180.0])
    te = np.array([19.0, 49.0, 19.0, 19.0, 50.0, np.inf])
    r = M.rete_pass_rates(re, te)
    assert r["re2"] == 2 / 6          # 1.9, 1.9 (strict <2, 2.0 fails)
    assert r["re5"] == 4 / 6          # + 4.9, 2.0 (strict <5, 5.0 fails)
    assert r["te2"] == 3 / 6          # the three 19s (strict <20)
    assert r["te5"] == 4 / 6          # + 49 (strict <50, 50.0 fails)
    assert r["rete2"] == 1 / 6        # only (1.9,19); (1.9,49) fails te,
                                      # (2.0,19) fails re
    assert r["rete5"] == 4 / 6        # (1.9,19), (1.9,49), (4.9,19), (2.0,19)
