import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.ops import augment


def _img(rng):
    return jnp.asarray(rng.uniform(0, 255, (32, 32, 3)), jnp.float32)


def test_color_augment_bounds_and_determinism():
    rng = np.random.default_rng(0)
    img = _img(rng)
    f = jax.jit(augment.color_augment)
    out1 = f(jax.random.PRNGKey(1), img)
    out2 = f(jax.random.PRNGKey(1), img)
    out3 = f(jax.random.PRNGKey(2), img)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))  # PRNG-keyed
    assert not np.array_equal(np.asarray(out1), np.asarray(out3))
    assert float(out1.min()) >= 0.0 and float(out1.max()) <= 255.0


def test_individual_ops_shapes():
    rng = np.random.default_rng(1)
    img = _img(rng)
    k = jax.random.PRNGKey(0)
    for fn in (augment.salt_and_pepper, augment.motion_blur,
               augment.coarse_dropout, augment.gaussian_blur,
               augment.add_value, augment.invert, augment.multiply,
               augment.contrast_normalization):
        out = jax.jit(fn)(k, img)
        assert out.shape == img.shape, fn.__name__
        assert np.isfinite(np.asarray(out)).all(), fn.__name__


def test_invert_full_prob():
    rng = np.random.default_rng(2)
    img = _img(rng)
    out = augment.invert(jax.random.PRNGKey(0), img, p=1.0)
    np.testing.assert_allclose(np.asarray(out), 255.0 - np.asarray(img), rtol=1e-6)


def test_coarse_dropout_zeroes():
    rng = np.random.default_rng(3)
    img = jnp.full((40, 40, 3), 100.0)
    out = np.asarray(augment.coarse_dropout(jax.random.PRNGKey(4), img, p=0.5))
    assert (out == 0).any() and (out == 100.0).any()


def test_batched_vmap():
    rng = np.random.default_rng(4)
    imgs = jnp.asarray(rng.uniform(0, 255, (4, 32, 32, 3)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(5), 4)
    out = jax.jit(jax.vmap(augment.color_augment))(keys, imgs)
    assert out.shape == imgs.shape
    # different keys -> different augmentations
    assert not np.array_equal(np.asarray(out[0]), np.asarray(out[1]))
