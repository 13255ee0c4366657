"""Multi-object (LM-style) model path + woProg ablation tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from checkerpose_tpu.models import InitNet, PoseNet
from checkerpose_tpu.models.ablation import PoseNetWoProg
from checkerpose_tpu.ops.knn import knn_index
from checkerpose_tpu.ops.geometry import pc_normalize
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.state import create_init_state, create_pose_state, make_optimizer

NPT, K, NOBJ, CROP = 16, 5, 3, 256


@pytest.fixture(scope="module")
def tables():
    rng = np.random.default_rng(0)
    p3d = rng.uniform(-30, 30, (NOBJ, NPT, 3)).astype(np.float32)
    normed = np.stack([pc_normalize(p.astype(np.float64)).astype(np.float32) for p in p3d])
    knn = np.stack([knn_index(n, K) for n in normed])
    return p3d, normed, knn


def _batch(rng, B, crop_gt=64):
    return {
        "image": rng.integers(0, 255, (B, CROP, CROP, 3)).astype(np.uint8),
        "proj_xy": np.stack([rng.uniform(60, 170, (B, NPT)),
                             rng.uniform(70, 180, (B, NPT))], -1).astype(np.float32),
        "bbox": np.tile(np.array([50, 60, 130, 130], np.float32), (B, 1)),
        "mask_visib": (rng.random((B, crop_gt, crop_gt)) > 0.5).astype(np.float32),
        "mask_full": (rng.random((B, crop_gt, crop_gt)) > 0.3).astype(np.float32),
        "obj_idx": np.array([0, 1, 2, 0][:B], np.int32),
    }


def test_knn_for_batch_gathers(tables):
    _, _, knn = tables
    batch = {"obj_idx": jnp.asarray([2, 0])}
    out = steps.knn_for_batch(knn, batch)
    assert out.shape == (2, NPT, K)
    np.testing.assert_array_equal(np.asarray(out[0]), knn[2])
    np.testing.assert_array_equal(np.asarray(out[1]), knn[0])
    # 2-D static index passes through untouched
    single = knn[0]
    assert steps.knn_for_batch(single, batch) is single


def test_multiobj_pretrain_step(tables):
    p3d, normed, knn = tables
    net = InitNet(npoint=NPT, res_log2=3, backbone_name="resnet34",
                  num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    st = create_init_state(net, knn[0], CROP, opt)
    sd = {"params": st.params, "batch_stats": st.batch_stats, "opt_state": st.opt_state}
    step = steps.make_pretrain_step(net, knn, opt, crop_size_gt=128,
                                    use_pepper_salt=False, use_motion_blur=False)
    rng = np.random.default_rng(1)
    batch = _batch(rng, 3)
    sd, metrics = step(sd, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_multiobj_train_step(tables):
    p3d, normed, knn = tables
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    opt = make_optimizer(1e-3)
    st = create_pose_state(net, knn[0], CROP, opt, NPT)
    sd = {"params": st.params, "batch_stats": st.batch_stats, "opt_state": st.opt_state}
    step = steps.make_train_step(net, knn, opt, stage=2,
                                 use_pepper_salt=False, use_motion_blur=False)
    rng = np.random.default_rng(2)
    batch = _batch(rng, 3)
    batch["p3d_normed"] = normed[batch["obj_idx"]]
    sd, metrics = step(sd, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_woprog_ablation(tables):
    p3d, normed, knn = tables
    net = PoseNetWoProg(npoint=NPT, res_log2=6, backbone_name="resnet34",
                        num_graph_module=1, init_num_graph_module=1,
                        dtype=jnp.float32)
    img = jnp.zeros((2, CROP, CROP, 3))
    v = net.init(jax.random.PRNGKey(0), img, knn[0], stage=3, train=False)
    out = net.apply(v, img, knn[0], stage=3, train=False)
    # full-width bits at once, ids at full 64 resolution
    assert out["x_logits"].shape == (2, NPT, 6)
    assert int(out["x_id"].max()) < 64
    assert out["seg_logits"].shape == (2, 64, 64, 2)
    # trains with full_bits
    opt = make_optimizer(1e-3)
    st = create_pose_state(net, knn[0], CROP, opt, NPT)
    sd = {"params": st.params, "batch_stats": st.batch_stats, "opt_state": st.opt_state}
    step = steps.make_train_step(net, knn, opt, stage=3, full_bits=True,
                                 use_pepper_salt=False, use_motion_blur=False)
    rng = np.random.default_rng(3)
    batch = _batch(rng, 3)
    batch["p3d_normed"] = normed[batch["obj_idx"]]
    sd, metrics = step(sd, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_gather_neighbors_onehot_parity():
    """One-hot-matmul per-sample gather == take_along_axis, value-exact
    (selection: each output element is exactly one input element), and the
    gradient (a transposed matmul vs a scatter-add) matches too."""
    from checkerpose_tpu.models import graph

    rng = np.random.default_rng(3)
    B, N, Kn, C = 4, 24, 6, 8
    idx = jnp.asarray(rng.integers(0, N, (B, N, Kn)), jnp.int32)

    def ref(x, i):
        return jnp.take_along_axis(x[:, :, None, :], i[..., None], axis=1)

    for dt in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(rng.standard_normal((B, N, C)), dt)
        got = jax.jit(graph.gather_neighbors)(x, idx)
        want = ref(x, idx)
        assert got.dtype == x.dtype
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))

    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    ct = jnp.asarray(rng.standard_normal((B, N, Kn, C)), jnp.float32)
    g_got = jax.grad(lambda v: jnp.vdot(graph.gather_neighbors(v, idx), ct))(x)
    g_want = jax.grad(lambda v: jnp.vdot(ref(v, idx), ct))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               rtol=1e-6, atol=1e-6)


def _primitive_names(jaxpr):
    """All primitive names in a jaxpr, recursing into sub-jaxprs (scan/cond/
    pjit bodies). Matching `eqn.primitive.name == "scan"` exactly instead of
    a substring over `str(jaxpr)` — a variable or scope merely *containing*
    'scan' must not flip the regression assertions (ADVICE r4)."""
    names = set()
    for eqn in jaxpr.eqns:
        names.add(eqn.primitive.name)
        for v in eqn.params.values():
            vs = v if isinstance(v, (tuple, list)) else (v,)
            for u in vs:
                inner = getattr(u, "jaxpr", None)
                if inner is not None:
                    names |= _primitive_names(inner)
    return names


def test_init_net_edgeconv_no_onehot_scan():
    """Regression for the round-4 cli.pretrain_lm compile blowup: the one-hot
    gather scan inside the INIT net's EdgeConvs pushed the first-step XLA
    compile past 50 min on this host, while the identical gather in the full
    refine net compiled in ~2.5 min (NOTES_ROUND4.md session 9). The init
    net's K-gather is tiny, so it must lower via take_along_axis (no scan in
    the jaxpr); EdgeConv's default keeps the one-hot scan for the refine GNN
    where the ~6x step win lives."""
    from checkerpose_tpu.models import graph

    rng = np.random.default_rng(0)
    B, N, Kn, C = 2, 16, 4, 8
    x = jnp.asarray(rng.standard_normal((B, N, C)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, N, (B, N, Kn)), jnp.int32)

    def jaxpr_of(onehot_gather):
        ec = graph.EdgeConv(8, onehot_gather=onehot_gather)
        variables = ec.init(jax.random.PRNGKey(0), x, idx, False)
        return jax.make_jaxpr(
            lambda v, a, i: ec.apply(v, a, i, True,
                                     mutable=["batch_stats"]))(variables, x, idx)

    assert "scan" not in _primitive_names(jaxpr_of(False).jaxpr)
    assert "scan" in _primitive_names(jaxpr_of(True).jaxpr)

    # value parity between the two paths (train-mode forward)
    ec_oh = graph.EdgeConv(8, onehot_gather=True)
    ec_ta = graph.EdgeConv(8, onehot_gather=False)
    variables = ec_oh.init(jax.random.PRNGKey(1), x, idx, False)
    out_oh, _ = ec_oh.apply(variables, x, idx, True, mutable=["batch_stats"])
    out_ta, _ = ec_ta.apply(variables, x, idx, True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_oh, np.float32),
                                  np.asarray(out_ta, np.float32))

    # and the wired-in InitNet itself must not carry the scan on the
    # per-sample (LM) path
    from checkerpose_tpu.models.init_net import InitNet
    net = InitNet(npoint=N, res_log2=3, backbone_name="resnet34",
                  num_graph_module=1)
    img = jnp.zeros((B, 256, 256, 3), jnp.float32)
    nv = jax.eval_shape(lambda: net.init(jax.random.PRNGKey(0), img, idx, False))
    jaxpr = jax.make_jaxpr(
        lambda v, a, i: net.apply(v, a, i, True, mutable=["batch_stats"]),
    )(jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), nv), img, idx)
    assert "scan" not in _primitive_names(jaxpr.jaxpr)
