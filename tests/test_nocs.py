"""NOCS backbone-bootstrap component (models/nocs.py, steps.nocs_labels,
cli.common.maybe_graft_pretrained_backbone)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from checkerpose_tpu.models.nocs import NOCSNet
from checkerpose_tpu.models.init_net import InitNet
from checkerpose_tpu.ops import geometry
from checkerpose_tpu.ops.knn import knn_index
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.checkpoint import CheckpointManager
from checkerpose_tpu.train.state import create_init_state, make_optimizer


K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float64)


def test_nocs_labels_roundtrip_project():
    """Model points projected through (R, t, K) land in crop cells; feeding
    their z into nocs_labels at those cells must recover the points'
    normalized model coordinates (within cell-center quantization)."""
    rng = np.random.default_rng(0)
    S = 64
    diameter = 100.0
    m = rng.uniform(-40, 40, (200, 3))                    # model pts, mm
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    t = np.array([5.0, -10.0, 400.0])
    cam = m @ Q.T + t
    uv, _ = geometry.project_pts(m, K, Q, t)
    x0, y0 = uv.min(0) - 5
    side = float(max(*(uv.max(0) - uv.min(0) + 10)))
    bbox = geometry.square_bbox(np.array([x0, y0, side, side])).astype(np.float64)

    # place each point's z at its crop cell; drop cell collisions (the
    # last writer would corrupt the other point's roundtrip)
    xi = np.clip(((uv[:, 0] - bbox[0]) / (bbox[2] / S)).astype(int), 0, S - 1)
    yi = np.clip(((uv[:, 1] - bbox[1]) / (bbox[3] / S)).astype(int), 0, S - 1)
    flat = yi * S + xi
    _, first, counts = np.unique(flat, return_index=True, return_counts=True)
    keep = np.zeros(len(m), bool)
    keep[first[counts == 1]] = True
    m, cam, uv, xi, yi = m[keep], cam[keep], uv[keep], xi[keep], yi[keep]
    depth = np.zeros((S, S), np.float32)
    depth[yi, xi] = cam[:, 2]
    mask = (depth > 0).astype(np.float32)

    nocs, valid = steps.nocs_labels(
        jnp.asarray(depth)[None], jnp.asarray(mask)[None],
        jnp.asarray(bbox, jnp.float32)[None], jnp.asarray(K, jnp.float32)[None],
        jnp.asarray(Q, jnp.float32)[None], jnp.asarray(t, jnp.float32)[None],
        diameter)
    nocs = np.asarray(nocs)[0]
    valid = np.asarray(valid)[0]
    assert valid.sum() >= 100  # enough collision-free cells to be meaningful
    got = nocs[yi, xi]
    want = m / diameter + 0.5
    # tolerance: cell-center offset <= 0.5 cell = 0.5*bbox_w/S px, lateral
    # error <= px * z / f, normalized by diameter
    tol = 0.75 * (bbox[2] / S) * (cam[:, 2].max() / K[0, 0]) / diameter
    err = np.abs(got - want)[valid[yi, xi] > 0.5]
    assert err.max() < max(tol, 0.02), (err.max(), tol)


def test_nocs_labels_invalid_pixels():
    """Zero depth or zero mask -> valid 0; degenerate geometry NaN-free."""
    S = 8
    nocs, valid = steps.nocs_labels(
        jnp.zeros((1, S, S)), jnp.ones((1, S, S)),
        jnp.asarray([[10., 10., 64., 64.]]), jnp.asarray(K, jnp.float32)[None],
        jnp.eye(3)[None], jnp.asarray([[0., 0., 300.]]), 100.0)
    assert float(np.asarray(valid).sum()) == 0.0
    assert np.isfinite(np.asarray(nocs)).all()


@pytest.fixture(scope="module")
def tiny_nocs():
    net = NOCSNet(backbone_name="resnet34", head_width=16, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = jax.jit(net.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), img, train=False)
    return net, opt, variables


def test_nocs_train_step_updates(tiny_nocs):
    net, opt, variables = tiny_nocs
    step = steps.make_nocs_train_step(net, opt, diameter=100.0,
                                      use_pepper_salt=False,
                                      use_motion_blur=False,
                                      color_aug_prob=0.0)
    rng = np.random.default_rng(1)
    B, S = 2, 16   # 64/4 = stride-4 head resolution
    batch = {
        "image": rng.integers(0, 255, (B, 64, 64, 3)).astype(np.uint8),
        "depth": rng.uniform(300, 500, (B, S, S)).astype(np.float32),
        "mask_visib": (rng.random((B, S, S)) > 0.4).astype(np.float32),
        "bbox": np.tile(np.array([40., 50., 120., 120.], np.float32), (B, 1)),
        "cam_K": np.tile(K.astype(np.float32), (B, 1, 1)),
        "R": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
        "t": np.tile(np.array([0., 0., 400.], np.float32), (B, 1)),
    }
    sd = {"params": variables["params"],
          "batch_stats": variables.get("batch_stats", {}),
          "opt_state": opt.init(variables["params"])}
    before = np.asarray(jax.tree.leaves(sd["params"])[0]).copy()
    losses = []
    for i in range(3):
        sd, m = step(sd, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert not np.allclose(before, np.asarray(jax.tree.leaves(sd["params"])[0]))
    assert losses[-1] < losses[0]  # same batch thrice: loss must drop


def test_graft_pretrained_backbone(tmp_path, tiny_nocs):
    """NOCS checkpoint -> maybe_graft_pretrained_backbone -> InitNet carries
    the NOCS backbone leaves; head/graph params untouched."""
    from checkerpose_tpu.cli.common import maybe_graft_pretrained_backbone
    net, opt, variables = tiny_nocs
    # perturb the NOCS backbone so the graft is observable
    params = jax.tree.map(lambda x: x + 1.5, variables["params"])
    mgr = CheckpointManager(str(tmp_path / "nocs"))
    from checkerpose_tpu.train.state import TrainState
    mgr.save(TrainState(params=params,
                        batch_stats=variables.get("batch_stats", {}),
                        opt_state=opt.init(params), step=7, best_score=0.0))
    mgr.wait()

    p3d = np.random.default_rng(0).uniform(-30, 30, (16, 3)).astype(np.float32)
    knn = knn_index(p3d, 5)
    init_net = InitNet(npoint=16, res_log2=3, backbone_name="resnet34",
                       num_graph_module=1, dtype=jnp.float32)
    state = create_init_state(init_net, knn, 64, make_optimizer(1e-3))
    cfg = {"backbone_pretrain_checkpoint": str(tmp_path / "nocs")}
    g = maybe_graft_pretrained_backbone(cfg, state)
    a = np.asarray(jax.tree.leaves(g.params["backbone"])[0])
    b = np.asarray(jax.tree.leaves(params["backbone"])[0])
    np.testing.assert_allclose(a, b)
    # non-backbone params unchanged
    for k in g.params:
        if k != "backbone":
            np.testing.assert_array_equal(
                np.asarray(jax.tree.leaves(g.params[k])[0]),
                np.asarray(jax.tree.leaves(state.params[k])[0]))
    # resumed state (step>0) must NOT graft
    resumed = maybe_graft_pretrained_backbone(
        cfg, TrainState(params=state.params, batch_stats=state.batch_stats,
                        opt_state=state.opt_state, step=5, best_score=0.0))
    assert resumed is not g
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(resumed.params["backbone"])[0]),
        np.asarray(jax.tree.leaves(state.params["backbone"])[0]))


def test_graft_missing_checkpoint_is_fail_soft(tmp_path, capsys):
    """A cfg pointing at a nonexistent/empty backbone checkpoint must warn
    and return the state unchanged — a raise here wedges the segmented
    proof drivers in an infinite retry loop (tools/run_synth_proof*.sh)."""
    from checkerpose_tpu.cli.common import maybe_graft_pretrained_backbone
    p3d = np.random.default_rng(0).uniform(-30, 30, (16, 3)).astype(np.float32)
    knn = knn_index(p3d, 5)
    init_net = InitNet(npoint=16, res_log2=3, backbone_name="resnet34",
                       num_graph_module=1, dtype=jnp.float32)
    state = create_init_state(init_net, knn, 64, make_optimizer(1e-3))
    cfg = {"backbone_pretrain_checkpoint": str(tmp_path / "does_not_exist")}
    g = maybe_graft_pretrained_backbone(cfg, state)
    assert g is state
    assert "training the backbone from scratch" in capsys.readouterr().out
