"""Stateless, on-device color augmentations.

Re-expresses the reference imgaug pipeline
(`checkerpose/GDR_Net_Augmentation.py:161-178`, applied with prob 0.8 at
`bop_dataset_pytorch.py:400-405`) as pure jax functions keyed by a PRNG key.
Same op set and probabilities; runs batched on TPU via vmap instead of in
DataLoader worker processes (this host has a single CPU core, so moving
augmentation on-device is also the only way to feed the chip).

All ops take/return float32 HWC images in [0, 255].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _maybe(key, p, fn, img):
    """Apply `fn(key, img)` with probability p (iaa.Sometimes)."""
    k1, k2 = jax.random.split(key)
    return jnp.where(jax.random.uniform(k1) < p, fn(k2, img), img)


def salt_and_pepper(key, img, p=0.05):
    k1, k2 = jax.random.split(key)
    hit = jax.random.uniform(k1, img.shape[:2]) < p
    salt = jax.random.uniform(k2, img.shape[:2]) < 0.5
    repl = jnp.where(salt, 255.0, 0.0)[:, :, None]
    return jnp.where(hit[:, :, None], repl, img)


_MOTION_KERNELS = None


def _motion_kernels(k=5):
    """Four 5-tap line kernels (horizontal/vertical/two diagonals).

    Cached as NUMPY (caching a jnp array built during a jit trace would leak
    a tracer into module state); jnp conversion happens per use site.
    """
    global _MOTION_KERNELS
    if _MOTION_KERNELS is None:
        import numpy as np
        base = np.zeros((k, k), np.float32)
        h = base.copy(); h[k // 2, :] = 1.0 / k
        v = base.copy(); v[:, k // 2] = 1.0 / k
        d1 = np.eye(k, dtype=np.float32) / k
        d2 = np.fliplr(np.eye(k, dtype=np.float32)) / k
        _MOTION_KERNELS = np.stack([h, v, d1, d2])
    return jnp.asarray(_MOTION_KERNELS)


def _depthwise_conv(img, kern):
    """HWC image, (k,k) kernel -> same-padded depthwise conv."""
    x = img.transpose(2, 0, 1)[:, None]          # (C,1,H,W)
    w = kern[None, None]                          # (1,1,k,k)
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME")
    return y[:, 0].transpose(1, 2, 0)


def motion_blur(key, img, k=5):
    kerns = _motion_kernels(k)
    idx = jax.random.randint(key, (), 0, kerns.shape[0])
    return _depthwise_conv(img, kerns[idx])


def coarse_dropout(key, img, p=0.1, size_percent=0.05):
    H, W = img.shape[:2]
    h = max(int(H * size_percent), 1)
    w = max(int(W * size_percent), 1)
    keep = jax.random.uniform(key, (h, w)) >= p
    keep = jax.image.resize(keep.astype(jnp.float32), (H, W), "nearest")
    return img * keep[:, :, None]


def gaussian_blur(key, img, max_sigma=1.0, k=5):
    sigma = jax.random.uniform(key, (), minval=0.0, maxval=max_sigma)
    sigma = jnp.maximum(sigma, 1e-3)
    r = jnp.arange(k, dtype=jnp.float32) - (k - 1) / 2
    g = jnp.exp(-0.5 * (r / sigma) ** 2)
    g = g / jnp.sum(g)
    kern = g[:, None] * g[None, :]
    return _depthwise_conv(img, kern)


def add_value(key, img, lo=-20.0, hi=20.0, per_channel_p=0.3):
    k1, k2, k3 = jax.random.split(key, 3)
    per_ch = jax.random.uniform(k1) < per_channel_p
    v_ch = jax.random.uniform(k2, (3,), minval=lo, maxval=hi)
    v_one = jax.random.uniform(k3, (), minval=lo, maxval=hi)
    v = jnp.where(per_ch, v_ch, jnp.broadcast_to(v_one, (3,)))
    return img + v[None, None, :]


def invert(key, img, p=0.2):
    hit = jax.random.uniform(key, (3,)) < p
    return jnp.where(hit[None, None, :], 255.0 - img, img)


def multiply(key, img, lo=0.7, hi=1.4, per_channel_p=0.0):
    k1, k2, k3 = jax.random.split(key, 3)
    per_ch = jax.random.uniform(k1) < per_channel_p
    m_ch = jax.random.uniform(k2, (3,), minval=lo, maxval=hi)
    m_one = jax.random.uniform(k3, (), minval=lo, maxval=hi)
    m = jnp.where(per_ch, m_ch, jnp.broadcast_to(m_one, (3,)))
    return img * m[None, None, :]


def contrast_normalization(key, img, lo=0.5, hi=2.0, per_channel_p=0.3):
    k1, k2, k3 = jax.random.split(key, 3)
    per_ch = jax.random.uniform(k1) < per_channel_p
    a_ch = jax.random.uniform(k2, (3,), minval=lo, maxval=hi)
    a_one = jax.random.uniform(k3, (), minval=lo, maxval=hi)
    a = jnp.where(per_ch, a_ch, jnp.broadcast_to(a_one, (3,)))
    return (img - 127.5) * a[None, None, :] + 127.5


def color_augment(key, img, use_pepper_salt=True, use_motion_blur=True,
                  apply_prob=0.8):
    """Full reference augmentation chain on one HWC float image in [0,255].

    Order and probabilities mirror `GDR_Net_Augmentation.build_augmentations`
    (reference `:161-178`) and the 0.8 outer gate
    (`bop_dataset_pytorch.py:400-405`). Use vmap over leading batch dim with
    split keys for a batch.
    """
    keys = jax.random.split(key, 10)

    def chain(img):
        x = img
        if use_pepper_salt:
            x = _maybe(keys[1], 0.3, salt_and_pepper, x)
        if use_motion_blur:
            x = _maybe(keys[2], 0.2, motion_blur, x)
        x = _maybe(keys[3], 0.4, coarse_dropout, x)
        x = _maybe(keys[4], 0.5, gaussian_blur, x)
        x = _maybe(keys[5], 0.5, add_value, x)
        x = _maybe(keys[6], 0.4, invert, x)
        x = _maybe(keys[7], 0.5, lambda k, i: multiply(k, i, per_channel_p=0.8), x)
        x = _maybe(keys[8], 0.5, multiply, x)
        x = _maybe(keys[9], 0.5, contrast_normalization, x)
        return jnp.clip(x, 0.0, 255.0)

    return jnp.where(jax.random.uniform(keys[0]) < apply_prob, chain(img), img)
