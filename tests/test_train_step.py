import numpy as np
import jax
import jax.numpy as jnp
import pytest

from checkerpose_tpu.models import InitNet, PoseNet
from checkerpose_tpu.ops.knn import knn_index
from checkerpose_tpu.train.state import (create_init_state, create_pose_state,
                                         make_optimizer, graft_init_params,
                                         param_count)
from checkerpose_tpu.train import steps

NPT = 16
CROP = 256


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    p3d = rng.uniform(-30, 30, (NPT, 3)).astype(np.float32)
    knn = knn_index(p3d, 5)
    return p3d, knn


def _fake_batch(rng, B=2, crop_gt=64):
    bbox = np.tile(np.array([50, 60, 130, 130], np.float32), (B, 1))
    proj = np.stack([rng.uniform(60, 170, (B, NPT)),
                     rng.uniform(70, 180, (B, NPT))], -1).astype(np.float32)
    return {
        "image": rng.integers(0, 255, (B, CROP, CROP, 3)).astype(np.uint8),
        "proj_xy": proj,
        "bbox": bbox,
        "mask_visib": (rng.random((B, crop_gt, crop_gt)) > 0.5).astype(np.float32),
        "mask_full": (rng.random((B, crop_gt, crop_gt)) > 0.3).astype(np.float32),
    }


def test_pretrain_step_decreases_loss(setup):
    p3d, knn = setup
    net = InitNet(npoint=NPT, res_log2=3, backbone_name="resnet34",
                  num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_init_state(net, knn, CROP, opt)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    step = steps.make_pretrain_step(net, knn, opt, crop_size_gt=128,
                                    use_pepper_salt=False, use_motion_blur=False)
    rng = np.random.default_rng(1)
    batch = _fake_batch(rng)
    losses = []
    for i in range(8):
        sd, metrics = step(sd, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_init_eval_step(setup):
    p3d, knn = setup
    net = InitNet(npoint=NPT, res_log2=3, backbone_name="resnet34",
                  num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_init_state(net, knn, CROP, opt)
    ev = steps.make_init_eval_step(net, knn, crop_size_gt=128)
    batch = _fake_batch(np.random.default_rng(2))
    out = ev(state.variables(), batch)
    assert out["acc_mask"].shape == (2,)
    assert out["bit_err"].shape == (2, 7)
    assert np.isfinite(np.asarray(out["acc_x"])).all()


def test_train_step_posenet(setup):
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    step = steps.make_train_step(net, knn, opt, stage=3,
                                 use_pepper_salt=False, use_motion_blur=False)
    rng = np.random.default_rng(3)
    batch = _fake_batch(rng)
    from checkerpose_tpu.ops.geometry import pc_normalize
    batch["p3d_normed"] = np.tile(pc_normalize(p3d)[None], (2, 1, 1)).astype(np.float32)
    losses = []
    for i in range(4):
        sd, metrics = step(sd, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    for k in ("loss_roi", "loss_x", "loss_y", "loss_seg_visib", "loss_seg_full"):
        assert np.isfinite(float(metrics[k]))


def test_graft_init_params(setup):
    p3d, knn = setup
    init_net = InitNet(npoint=NPT, res_log2=3, backbone_name="resnet34",
                       num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    ist = create_init_state(init_net, knn, CROP, opt)
    # poison a leaf to verify the graft actually copies
    marked = jax.tree.map(lambda x: x + 7.0, ist.params)
    pose_net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                       num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    pst = create_pose_state(pose_net, knn, CROP, opt, NPT,
                            init_params={"params": marked})
    leaf = jax.tree.leaves(pst.params["init_net"]["mlp"])[0]
    ref = jax.tree.leaves(marked["mlp"])[0]
    np.testing.assert_array_equal(np.asarray(leaf), np.asarray(ref))
    assert param_count(pst.params) > 20.0  # ~28M for resnet34 posenet


def test_pose_forward(setup):
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    fwd = steps.make_pose_forward(net, knn, stage=3)
    batch = _fake_batch(np.random.default_rng(4))
    from checkerpose_tpu.ops.geometry import pc_normalize
    batch["p3d_normed"] = np.tile(pc_normalize(p3d)[None], (2, 1, 1)).astype(np.float32)
    out = fwd(state.variables(), batch)
    assert out["x_id"].shape == (2, NPT)
    assert out["seg_visib"].shape == (2, 64, 64)
    assert 0.0 <= float(out["seg_visib"].min()) and float(out["seg_visib"].max()) <= 1.0


def test_evaluate_pipeline_stacked_modes(setup):
    """All three filter modes through ONE stacked solver dispatch (round-2
    rework of VERDICT weak #7), plus symmetric-closest rotation error."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    rng = np.random.default_rng(5)
    batch = _fake_batch(rng)
    from checkerpose_tpu.ops.geometry import pc_normalize
    batch["p3d_normed"] = np.tile(pc_normalize(p3d)[None], (2, 1, 1)).astype(np.float32)
    batch["R"] = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
    batch["t"] = np.tile(np.array([0, 0, 400], np.float32)[None], (2, 1))
    batch["cam_K"] = np.tile(np.array([[572.4, 0, 325], [0, 573.5, 242],
                                       [0, 0, 1]], np.float32)[None], (2, 1, 1))
    batch["valid"] = np.ones(2, np.float32)
    batch["scene_id"] = np.zeros(2, np.int32)
    batch["im_id"] = np.arange(2, dtype=np.int32)

    from checkerpose_tpu.eval.harness import evaluate_pipeline
    sym = np.stack([np.eye(3), np.diag([-1.0, -1.0, 1.0])]).astype(np.float32)
    report = evaluate_pipeline(
        net, knn, state.variables(), iter([dict(batch)]), p3d, 60.0,
        stage=3, use_adi=False, num_hyp=16, sym_rots=sym,
        filter_modes=("none", "full", "visib"), main_filter="none")
    for mode in ("none", "full", "visib"):
        assert {"adx02", "adx05", "adx10", "mean_re_deg",
                "rete2", "rete5", "re2", "re5", "te2", "te5"} <= set(report[mode])
        assert 0.0 <= report[mode]["adx10"] <= 1.0
        # pass-rate monotonicity: joint <= each individual, @2 <= @5
        rm = report[mode]
        assert rm["rete2"] <= min(rm["re2"], rm["te2"]) + 1e-9
        assert rm["rete5"] <= min(rm["re5"], rm["te5"]) + 1e-9
        assert rm["re2"] <= rm["re5"] + 1e-9 and rm["te2"] <= rm["te5"] + 1e-9
    assert len(report["poses"]) == 2
    assert report["test_acc"] == report["none"]["adx10"]
    # sym-closest re can never exceed plain re
    plain = evaluate_pipeline(
        net, knn, state.variables(), iter([dict(batch)]), p3d, 60.0,
        stage=3, use_adi=False, num_hyp=16, sym_rots=None,
        filter_modes=("none",), main_filter="none")
    assert report["none"]["mean_re_deg"] <= plain["none"]["mean_re_deg"] + 1e-4


def test_evaluate_pipeline_soft_decode(setup):
    """decode_mode='soft' runs the same sweep on expected-id correspondences
    (float ids through ids_to_correspondences) and returns a sane report."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    rng = np.random.default_rng(5)
    batch = _fake_batch(rng)
    from checkerpose_tpu.ops.geometry import pc_normalize
    batch["p3d_normed"] = np.tile(pc_normalize(p3d)[None], (2, 1, 1)).astype(np.float32)
    batch["R"] = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
    batch["t"] = np.tile(np.array([0, 0, 400], np.float32)[None], (2, 1))
    batch["cam_K"] = np.tile(np.array([[572.4, 0, 325], [0, 573.5, 242],
                                       [0, 0, 1]], np.float32)[None], (2, 1, 1))
    batch["valid"] = np.ones(2, np.float32)
    batch["scene_id"] = np.zeros(2, np.int32)
    batch["im_id"] = np.arange(2, dtype=np.int32)

    from checkerpose_tpu.eval.harness import evaluate_pipeline
    report = evaluate_pipeline(
        net, knn, state.variables(), iter([dict(batch)]), p3d, 60.0,
        stage=3, use_adi=False, num_hyp=16,
        filter_modes=("visib",), main_filter="visib", decode_mode="soft")
    assert 0.0 <= report["visib"]["adx10"] <= 1.0
    assert np.isfinite(report["visib"]["mean_re_deg"])
    assert len(report["poses"]) == 2


def test_curriculum_stage_transition(setup):
    """One shared state must train through stage 1 -> 2 -> 3 (the progressive
    curriculum, reference train.py:272 get_train_stage): every stage variant
    applies to the same param/opt tree and produces finite losses."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    rng = np.random.default_rng(11)
    batch = _fake_batch(rng)
    from checkerpose_tpu.ops.geometry import pc_normalize
    batch["p3d_normed"] = np.tile(pc_normalize(p3d)[None], (2, 1, 1)).astype(np.float32)
    for i, stage in enumerate((1, 2, 3)):
        step = steps.make_train_step(net, knn, opt, stage=stage,
                                     use_pepper_salt=False,
                                     use_motion_blur=False)
        sd, metrics = step(sd, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"])), (stage, metrics)
    # late-stage params exist from init and stay finite through early stages
    leaves = jax.tree_util.tree_leaves(sd["params"])
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)


def test_aux_heatmap_loss_values():
    """Peaked-at-GT response maps -> small CE; peaked-elsewhere -> large;
    out-of-roi keypoints are excluded from the mean."""
    B, N, bits = 2, 5, 6
    rng = np.random.default_rng(3)
    x_id = rng.integers(0, 64, (B, N))
    y_id = rng.integers(0, 64, (B, N))
    cell = (y_id >> 3) * 8 + (x_id >> 3)
    good = np.full((B, N, 64), -5.0, np.float32)
    np.put_along_axis(good, cell[..., None], 5.0, axis=-1)
    bad = np.full((B, N, 64), -5.0, np.float32)
    np.put_along_axis(bad, ((cell + 17) % 64)[..., None], 5.0, axis=-1)
    roi = np.ones((B, N, 1), np.float32)
    l_good = float(steps._aux_heatmap_loss(jnp.asarray(good), jnp.asarray(roi),
                                           jnp.asarray(x_id), jnp.asarray(y_id), bits))
    l_bad = float(steps._aux_heatmap_loss(jnp.asarray(bad), jnp.asarray(roi),
                                          jnp.asarray(x_id), jnp.asarray(y_id), bits))
    assert l_good < 0.1 < 5.0 < l_bad
    # masked keypoints do not contribute: zero the mask where bad peaks live
    roi0 = roi.copy(); roi0[0] = 0.0
    mixed = good.copy(); mixed[0] = bad[0]
    l_mixed = float(steps._aux_heatmap_loss(jnp.asarray(mixed), jnp.asarray(roi0),
                                            jnp.asarray(x_id), jnp.asarray(y_id), bits))
    assert abs(l_mixed - l_good) < 0.1


def test_pretrain_step_aux_heatmap(setup):
    """aux_heatmap_weight wires the sown response maps into the loss (the
    from-scratch-backbone bootstrap; see steps._aux_heatmap_loss docstring)."""
    p3d, knn = setup
    net = InitNet(npoint=NPT, res_log2=3, backbone_name="resnet34",
                  num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_init_state(net, knn, CROP, opt)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    step = steps.make_pretrain_step(net, knn, opt, crop_size_gt=128,
                                    use_pepper_salt=False, use_motion_blur=False,
                                    aux_heatmap_weight=1.0)
    rng = np.random.default_rng(1)
    batch = _fake_batch(rng)
    losses, auxes = [], []
    for i in range(8):
        sd, metrics = step(sd, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        auxes.append(float(metrics["loss_aux"]))
    assert np.isfinite(losses).all() and np.isfinite(auxes).all()
    assert auxes[-1] < auxes[0], auxes


def test_train_step_aux_heatmap(setup):
    """PoseNet path: the init submodule's sown maps feed the aux loss."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    step = steps.make_train_step(net, knn, opt, stage=1,
                                 use_pepper_salt=False, use_motion_blur=False,
                                 aux_heatmap_weight=0.5)
    rng = np.random.default_rng(1)
    batch = _fake_batch(rng)
    batch["p3d_normed"] = np.tile(p3d / 40.0, (2, 1, 1)).astype(np.float32)
    sd, metrics = step(sd, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["loss_aux"]))


def test_train_step_aux_refine_and_teacher_force(setup):
    """Round-3 accuracy aids: dense refine heatmap heads + teacher-forced
    refine conditioning (both opt-in; reference parity = off). Covers param
    creation of the train-only aux convs, the sown-intermediate plumbing at
    every active stage, and that inference apply ignores the extra params."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1,
                  aux_refine_heads=True, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    assert "aux_resp_0" in state.params and "aux_resp_2" in state.params
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    step = steps.make_train_step(net, knn, opt, stage=2,
                                 use_pepper_salt=False, use_motion_blur=False,
                                 aux_refine_weight=0.5, teacher_force_prob=0.7)
    rng = np.random.default_rng(5)
    batch = _fake_batch(rng)
    batch["p3d_normed"] = np.tile(p3d / 40.0, (2, 1, 1)).astype(np.float32)
    refs = []
    for i in range(6):
        sd, metrics = step(sd, batch, jax.random.PRNGKey(i))
        refs.append(float(metrics["loss_aux_refine"]))
    assert np.isfinite(refs).all()
    assert refs[-1] < refs[0], refs  # dense heads learn the fixed batch
    # inference path must run with (and ignore) the aux params
    fwd = steps.make_pose_forward(net, knn, stage=3)
    out = fwd({"params": sd["params"], "batch_stats": sd["batch_stats"]}, batch)
    assert out["x_id"].shape == (2, NPT)


def test_teacher_force_gathers_gt_cells(setup):
    """With tf prob 1.0 the refine gather must read the GT MSB-prefix cell:
    verified by intercepting Index2Feat's ids via identical outputs when the
    init net is frozen-random but GT ids are fixed (smoke-level: the step must
    differ from the non-TF step on the same key, and both stay finite)."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    batch = _fake_batch(np.random.default_rng(6))
    batch["p3d_normed"] = np.tile(p3d / 40.0, (2, 1, 1)).astype(np.float32)
    outs = []
    for prob in (0.0, 1.0):
        # fresh buffers each run: the jitted step donates its state arg
        sd = jax.tree.map(jnp.array,
                          {"params": state.params,
                           "batch_stats": state.batch_stats,
                           "opt_state": state.opt_state})
        step = steps.make_train_step(net, knn, opt, stage=3,
                                     use_pepper_salt=False,
                                     use_motion_blur=False,
                                     color_aug_prob=0.0,
                                     teacher_force_prob=prob)
        sd, metrics = step(sd, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        outs.append(jax.tree.leaves(sd["params"])[0])
    assert not np.allclose(np.asarray(outs[0]), np.asarray(outs[1]))


def test_teacher_force_anneal_schedule():
    """Scheduled-sampling decay (cli.train wiring): constant before
    anneal_start, linear to 0 at anneal_end, 0 after; disabled when the
    window is empty or base is 0."""
    f = steps.teacher_force_prob_at
    assert f(0, 0.5, 12000, 20000) == 0.5
    assert f(12000, 0.5, 12000, 20000) == 0.5
    assert abs(f(16000, 0.5, 12000, 20000) - 0.25) < 1e-12
    assert f(20000, 0.5, 12000, 20000) == 0.0
    assert f(99999, 0.5, 12000, 20000) == 0.0
    assert f(5000, 0.5, 0, 0) == 0.5          # disabled window
    assert f(5000, 0.0, 12000, 20000) == 0.0  # no teacher forcing at all


def test_coord_reg_loss_math():
    """_coord_reg_loss: zero for a perfectly calibrated expectation, larger
    for a radially-shrunk field (the bias mode it exists to penalize,
    ACCURACY.md finding 5), and masked by roi_bit."""
    rng = np.random.default_rng(3)
    B, N, L = 2, 64, 6
    x_rel = rng.uniform(0, 64, (B, N)).astype(np.float32)
    y_rel = rng.uniform(0, 64, (B, N)).astype(np.float32)
    roi = np.ones((B, N, 1), np.float32)

    def logits_for(target_ids):
        # large +-logits reproducing the binary code of round(target - .5)
        ids = np.clip(np.round(target_ids - 0.5), 0, 63).astype(np.int64)
        bits = (ids[..., None] >> np.arange(L - 1, -1, -1)) & 1
        return (bits * 2.0 - 1.0) * 12.0  # sigmoid ~ {0,1}

    # calibrated: E[id] = floor-ish(target - .5) -> |err| <= quantization
    lx = jnp.asarray(logits_for(x_rel))
    ly = jnp.asarray(logits_for(y_rel))
    l_cal = float(steps._coord_reg_loss(lx, ly, jnp.asarray(x_rel),
                                        jnp.asarray(y_rel), jnp.asarray(roi),
                                        L, L))
    assert l_cal < 0.55 / 64  # within half-cell quantization / res norm
    # radially shrunk field (4% toward the centroid): loss must grow
    cx, cy = x_rel.mean(), y_rel.mean()
    sx = cx + (x_rel - cx) * 0.96
    sy = cy + (y_rel - cy) * 0.96
    l_shrunk = float(steps._coord_reg_loss(
        jnp.asarray(logits_for(sx)), jnp.asarray(logits_for(sy)),
        jnp.asarray(x_rel), jnp.asarray(y_rel), jnp.asarray(roi), L, L))
    assert l_shrunk > l_cal * 1.5
    # mask: zeroing roi ignores arbitrarily wrong logits
    l_masked = float(steps._coord_reg_loss(
        -lx, -ly, jnp.asarray(x_rel), jnp.asarray(y_rel),
        jnp.asarray(np.zeros_like(roi)), L, L))
    assert l_masked == 0.0


def test_train_step_with_coord_reg(setup):
    """coord_reg_weight wires through make_train_step: loss_coord reported
    finite and the step still updates params."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1,
                  dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    step = steps.make_train_step(net, knn, opt, stage=1,
                                 use_pepper_salt=False, use_motion_blur=False,
                                 color_aug_prob=0.0, coord_reg_weight=1.0)
    rng = np.random.default_rng(5)
    batch = _fake_batch(rng)
    batch["p3d_normed"] = np.tile(steps.geometry.pc_normalize(p3d)[None],
                                  (2, 1, 1)).astype(np.float32)
    sd = {"params": state.params, "batch_stats": state.batch_stats,
          "opt_state": state.opt_state}
    before = np.asarray(jax.tree.leaves(sd["params"])[0]).copy()
    sd, m = step(sd, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss_coord"]))
    assert float(m["loss_coord"]) > 0.0
    assert not np.allclose(before, np.asarray(jax.tree.leaves(sd["params"])[0]))


def test_finebit_bit_weights_resolution():
    """Cfg -> per-bit weight tuple: active only on the autonomous tail
    (default start = TF anneal end), boosting bits >= start_bit."""
    cfg = {"finebit_loss_boost_weight": 4.0,
           "refine_teacher_force_anneal_end": 5000}
    assert steps.finebit_bit_weights(cfg, 4999, 6) is None       # pre-tail
    assert steps.finebit_bit_weights(cfg, 5000, 6) == (1.0, 1.0, 1.0, 1.0, 4.0, 4.0)
    assert steps.finebit_bit_weights(cfg, 5000, 4) is None       # no boosted bit yet
    cfg["finebit_boost_start_bit"] = 3
    assert steps.finebit_bit_weights(cfg, 5000, 4) == (1.0, 1.0, 1.0, 4.0)
    cfg["finebit_boost_start_step"] = 7000                        # explicit start
    assert steps.finebit_bit_weights(cfg, 6000, 4) is None
    assert steps.finebit_bit_weights(cfg, 7000, 4) == (1.0, 1.0, 1.0, 4.0)
    assert steps.finebit_bit_weights({}, 0, 6) is None            # parity default


def test_train_step_finebit_levers(setup):
    """bit_weights + prefix_correct_mask wire through make_train_step: the
    supervision-coverage metric is reported in [0,1], losses stay finite,
    params update; unit weights with masking off reproduce the parity loss."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    batch = _fake_batch(np.random.default_rng(9))
    from checkerpose_tpu.ops.geometry import pc_normalize
    batch["p3d_normed"] = np.tile(pc_normalize(p3d)[None], (2, 1, 1)).astype(np.float32)

    def fresh():
        return jax.tree.map(jnp.array,
                            {"params": state.params,
                             "batch_stats": state.batch_stats,
                             "opt_state": state.opt_state})

    # parity: unit weights == default masked loss
    base = steps.make_train_step(net, knn, opt, stage=3, use_pepper_salt=False,
                                 use_motion_blur=False, color_aug_prob=0.0)
    unit = steps.make_train_step(net, knn, opt, stage=3, use_pepper_salt=False,
                                 use_motion_blur=False, color_aug_prob=0.0,
                                 bit_weights=(1.0,) * 6)
    _, m0 = base(fresh(), batch, jax.random.PRNGKey(0))
    _, m1 = unit(fresh(), batch, jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(m0["loss_x"]), float(m1["loss_x"]), rtol=1e-5)
    np.testing.assert_allclose(float(m0["loss_y"]), float(m1["loss_y"]), rtol=1e-5)

    # boosted fine bits raise the x/y loss (untrained net: every bit has error)
    boosted = steps.make_train_step(net, knn, opt, stage=3, use_pepper_salt=False,
                                    use_motion_blur=False, color_aug_prob=0.0,
                                    bit_weights=(1.0, 1.0, 1.0, 1.0, 4.0, 4.0))
    _, m2 = boosted(fresh(), batch, jax.random.PRNGKey(0))
    assert float(m2["loss_x"]) > float(m0["loss_x"])

    # prefix-correct masking: coverage metric present, sane, loss finite,
    # params still update
    masked = steps.make_train_step(net, knn, opt, stage=3, use_pepper_salt=False,
                                   use_motion_blur=False, color_aug_prob=0.0,
                                   prefix_correct_mask=True,
                                   teacher_force_prob=0.5)
    sd = fresh()
    before = np.asarray(jax.tree.leaves(sd["params"])[0]).copy()
    sd, m3 = masked(sd, batch, jax.random.PRNGKey(0))
    frac = float(m3["finebit_sup_frac"])
    assert 0.0 <= frac <= 1.0
    assert np.isfinite(float(m3["loss"]))
    assert not np.allclose(before, np.asarray(jax.tree.leaves(sd["params"])[0]))


def test_evaluate_pipeline_filter_judge_bits(setup):
    """filter_judge_bits=k judges seg/boundary filters at the top-k-bit cell
    center (fine-bit filter-collapse mitigation, tools/diag_filter_collapse.py)
    and must produce a sane report; k=res_log2 must equal parity (the shift
    is zero, ids unchanged)."""
    p3d, knn = setup
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    state = create_pose_state(net, knn, CROP, opt, NPT)
    batch = _fake_batch(np.random.default_rng(5))
    from checkerpose_tpu.ops.geometry import pc_normalize
    batch["p3d_normed"] = np.tile(pc_normalize(p3d)[None], (2, 1, 1)).astype(np.float32)
    batch["R"] = np.tile(np.eye(3, dtype=np.float32)[None], (2, 1, 1))
    batch["t"] = np.tile(np.array([0, 0, 400], np.float32)[None], (2, 1))
    batch["cam_K"] = np.tile(np.array([[572.4, 0, 325], [0, 573.5, 242],
                                       [0, 0, 1]], np.float32)[None], (2, 1, 1))
    batch["valid"] = np.ones(2, np.float32)
    batch["scene_id"] = np.zeros(2, np.int32)
    batch["im_id"] = np.arange(2, dtype=np.int32)

    from checkerpose_tpu.eval.harness import evaluate_pipeline
    kw = dict(stage=3, use_adi=False, num_hyp=16,
              filter_modes=("visib",), main_filter="visib", seed=3)
    coarse = evaluate_pipeline(net, knn, state.variables(), iter([dict(batch)]),
                               p3d, 60.0, filter_judge_bits=4, **kw)
    assert 0.0 <= coarse["visib"]["adx10"] <= 1.0
    assert coarse["visib"]["n_valid_mean"] >= 0.0
    parity = evaluate_pipeline(net, knn, state.variables(), iter([dict(batch)]),
                               p3d, 60.0, filter_judge_bits=6, **kw)
    plain = evaluate_pipeline(net, knn, state.variables(), iter([dict(batch)]),
                              p3d, 60.0, **kw)
    assert parity["visib"]["n_valid_mean"] == plain["visib"]["n_valid_mean"]
