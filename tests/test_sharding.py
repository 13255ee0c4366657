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
