"""Multi-device (8 virtual CPU) data-parallel tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from checkerpose_tpu.parallel.mesh import make_mesh, shard_batch, replicate_tree


def test_mesh_axes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")


def test_shard_batch_places_on_mesh():
    mesh = make_mesh()
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2),
             "s": np.float32(3.0)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.spec[0] == "data"
    np.testing.assert_array_equal(np.asarray(out["x"]), batch["x"])


def test_dp_train_step_multichip():
    """One full-pipeline DP train step over the 8-device mesh: same math as
    single device, gradients all-reduced by XLA."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_dp_grad_equals_single_device():
    """Global-view DP must match the single-device gradient (sync-BN + summed
    loss are global reductions)."""
    from flax import linen as nn
    import optax

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    net = Tiny()
    x = np.random.default_rng(0).standard_normal((8, 4)).astype(np.float32)
    y = np.random.default_rng(1).standard_normal((8, 4)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss(p, x, y):
        return jnp.mean((net.apply(p, x) - y) ** 2)

    g_single = jax.grad(loss)(params, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh()
    ps = replicate_tree(params, mesh)
    xs = shard_batch({"x": x, "y": y}, mesh)
    g_multi = jax.jit(jax.grad(loss))(ps, xs["x"], xs["y"])
    for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_multi)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)


def _small_posenet(npoint=16):
    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.ops.knn import knn_index
    from checkerpose_tpu.ops.geometry import pc_normalize
    rng = np.random.default_rng(0)
    p3d = rng.uniform(-40, 40, (npoint, 3)).astype(np.float32)
    p3dn = pc_normalize(p3d).astype(np.float32)
    knn = knn_index(p3dn, 5)
    net = PoseNet(npoint=npoint, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    return net, knn, p3dn


def _posenet_batch(rng, B, npoint, p3dn):
    return {
        "image": rng.integers(0, 255, (B, 256, 256, 3)).astype(np.uint8),
        "proj_xy": rng.uniform(60, 180, (B, npoint, 2)).astype(np.float32),
        "bbox": np.tile(np.array([50, 60, 130, 130], np.float32), (B, 1)),
        "mask_visib": (rng.random((B, 64, 64)) > 0.5).astype(np.float32),
        "mask_full": (rng.random((B, 64, 64)) > 0.3).astype(np.float32),
        "p3d_normed": np.tile(p3dn[None], (B, 1, 1)),
    }


def test_dp_posenet_step_equals_single_device():
    """Round-2 VERDICT item 5: the REAL PoseNet train step must produce
    identical params, grads-effects, and BatchNorm batch_stats whether the
    batch is sharded over 8 devices or lives on one (global-view sync-BN)."""
    import optax

    from checkerpose_tpu.train import steps
    from checkerpose_tpu.train.state import create_pose_state

    net, knn, p3dn = _small_posenet()
    # SGD, not Adam: Adam's first step is +-lr*sign(grad), so gradients that
    # are numerically ~0 (fresh BN scales) amplify reduction-order noise into
    # a full +-lr param difference. With SGD the param delta is proportional
    # to the gradient, making DP-vs-single equality well-conditioned.
    opt = optax.sgd(1e-3)
    state = create_pose_state(net, knn, 256, opt, 16)
    batch = _posenet_batch(np.random.default_rng(1), 8, 16, p3dn)
    step = steps.make_train_step(net, knn, opt, stage=1, use_pepper_salt=False,
                                 use_motion_blur=False, color_aug_prob=0.0)
    key = jax.random.PRNGKey(7)

    # the step donates its state argument -> hand it fresh copies so the
    # originals survive for the multi-device run
    sd0 = jax.tree.map(jnp.array, {"params": state.params,
                                   "batch_stats": state.batch_stats,
                                   "opt_state": state.opt_state})
    single, m_single = step(sd0, {k: jnp.asarray(v) for k, v in batch.items()}, key)

    mesh = make_mesh()
    sdm = {"params": replicate_tree(state.params, mesh),
           "batch_stats": replicate_tree(state.batch_stats, mesh),
           "opt_state": replicate_tree(state.opt_state, mesh)}
    multi, m_multi = step(sdm, shard_batch(batch, mesh), key)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_multi["loss"]),
                               rtol=1e-4)
    report = []
    for name in ("params", "batch_stats"):
        paths = jax.tree_util.tree_leaves_with_path(single[name])
        multi_leaves = jax.tree.leaves(multi[name])
        for (path, a), b in zip(paths, multi_leaves):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            ad = np.abs(a - b).max()
            rd = (np.abs(a - b) / (np.abs(a) + 1e-6)).max()
            if not (ad < 5e-4 or rd < 1e-3):
                report.append((name + jax.tree_util.keystr(path), float(ad), float(rd)))
    assert not report, f"{len(report)} divergent leaves, worst: {sorted(report, key=lambda r: -r[1])[:5]}"


def test_sharded_solver_equals_unsharded():
    """solve_poses_batched under a data-sharded batch returns the same poses
    as unsharded (per-image program, no cross-batch coupling)."""
    from checkerpose_tpu.solver.ransac import solve_poses_batched
    rng = np.random.default_rng(3)
    N, B = 64, 8
    p3d = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
    K = np.array([[572.4, 0, 325.2], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    p2ds, valids = [], []
    for b in range(B):
        A = rng.standard_normal((3, 3)); Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = np.array([0.0, 0.0, 420.0])
        cam = p3d @ Q.T + t
        uv = cam @ K.T
        p2ds.append((uv[:, :2] / uv[:, 2:]).astype(np.float32))
        valids.append(np.ones(N, np.float32))
    p2d = np.stack(p2ds); valid = np.stack(valids)
    key = jax.random.PRNGKey(0)
    kw = dict(num_hyp=16)

    sol1 = solve_poses_batched(jnp.asarray(p3d), jnp.asarray(p2d),
                               jnp.asarray(valid), jnp.asarray(K), key, **kw)
    mesh = make_mesh()
    sb = shard_batch({"p2d": p2d, "valid": valid}, mesh)
    sol2 = solve_poses_batched(jnp.asarray(p3d), sb["p2d"], sb["valid"],
                               jnp.asarray(K), key, **kw)
    np.testing.assert_allclose(np.asarray(sol1["R"]), np.asarray(sol2["R"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(sol1["t"]), np.asarray(sol2["t"]),
                               rtol=1e-3, atol=1e-2)


def test_make_global_batch_single_process():
    """make_global_batch goes through make_array_from_process_local_data on
    every call; on one process the result must equal shard_batch."""
    from checkerpose_tpu.parallel.mesh import make_global_batch
    mesh = make_mesh()
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4),
             "s": np.float32(2.0)}
    g = make_global_batch(batch, mesh)
    s = shard_batch(batch, mesh)
    np.testing.assert_array_equal(np.asarray(g["x"]), np.asarray(s["x"]))
    assert g["x"].sharding.spec == s["x"].sharding.spec
    np.testing.assert_array_equal(np.asarray(g["s"]), batch["s"])


def test_shard_manifest_partition():
    from checkerpose_tpu.parallel.mesh import shard_manifest
    samples = list(range(10))
    parts = [shard_manifest(samples, i, 4) for i in range(4)]
    assert sorted(sum(parts, [])) == samples
    assert parts[0] == [0, 4, 8]
