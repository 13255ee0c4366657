"""On-device (XLA) batched depth rasterizer for GT-label rendering.

TPU-native counterpart of `eval/renderer.py` (the CPU z-buffer used for
offline VSD scoring): the NOCS backbone-pretraining step needs a GT depth
crop per training sample (`cli/pretrain_backbone.py`), and rendering it on
the 1-core host costs ~21 ms/item = 1.4 s per batch-64 step — an order of
magnitude over the compute. Here the mesh (verts, faces) is a static
constant baked into the jitted train step, and rasterization is a brute
force pixel-vs-face test scanned over face chunks: S^2 * F ~ 2M fused
elementwise ops per sample, microseconds on the VPU.

Reference provenance: the reference never renders on the train path (it
fine-tunes an ImageNet backbone instead, `model/backbone.py:39-50`); depth
rendering there exists only for VSD scoring via the C++ `bop_renderer`
(`bop_toolkit_lib/renderer_cpp.py:13-62`). Same perspective-correct
1/z-interpolation semantics as `eval/renderer.py::render_depth`.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

_CHUNK = 128  # faces per scan step: (CHUNK, S, S) intermediates stay small


def crop_intrinsics(cam_K: jnp.ndarray, bbox: jnp.ndarray, S: int):
    """Crop-adjusted intrinsics K' for a final square bbox mapped to an
    S-grid: fx' = fx*S/bw, cx' = (cx-bx)*S/bw (same mapping as
    `cli/pretrain_backbone.py` host path). cam_K (B,3,3), bbox (B,4)."""
    bw = jnp.maximum(bbox[:, 2], 1e-3)  # dummy samples carry a zero bbox
    bh = jnp.maximum(bbox[:, 3], 1e-3)
    fx = cam_K[:, 0, 0] * S / bw
    fy = cam_K[:, 1, 1] * S / bh
    cx = (cam_K[:, 0, 2] - bbox[:, 0]) * S / bw
    cy = (cam_K[:, 1, 2] - bbox[:, 1]) * S / bh
    return fx, fy, cx, cy


def render_depth_crops(verts, faces, R, t, cam_K, bbox, S: int):
    """Depth (B, S, S) f32 (0 = background) of a posed mesh on crop grids.

    verts (V, 3) / faces (F, 3) are static (numpy) constants; R (B, 3, 3),
    t (B, 3), cam_K (B, 3, 3) ORIGINAL-image intrinsics, bbox (B, 4) final
    square crop [x, y, w, h]. Depth unit = unit of t (mm).
    """
    verts = jnp.asarray(np.asarray(verts, np.float32))
    f = np.asarray(faces, np.int32)
    pad = (-len(f)) % _CHUNK
    if pad:  # degenerate (zero-area) padding faces are rejected by the test
        f = np.concatenate([f, np.zeros((pad, 3), np.int32)], axis=0)
    f = f.reshape(-1, _CHUNK, 3)  # (n_chunks, C, 3)
    fx, fy, cx, cy = crop_intrinsics(cam_K, bbox, S)
    g = jnp.arange(S, dtype=jnp.float32) + 0.5  # pixel centers

    def one(Rm, tv, fxi, fyi, cxi, cyi):
        cam = verts @ Rm.T + tv[None, :]                     # (V, 3)
        z = cam[:, 2]
        zok = z > 1e-6
        zs = jnp.maximum(z, 1e-6)
        u = fxi * cam[:, 0] / zs + cxi
        v = fyi * cam[:, 1] / zs + cyi
        w = 1.0 / zs                                          # (V,)

        gx = jnp.broadcast_to(g[None, None, :], (1, S, S))    # x along axis 2
        gy = jnp.broadcast_to(g[None, :, None], (1, S, S))

        def body(zbuf, tri):                                  # tri (C, 3)
            pu = u[tri]                                       # (C, 3)
            pv = v[tri]
            ww = w[tri]
            ok = zok[tri].all(axis=1)                         # near-plane cull
            area = ((pu[:, 1] - pu[:, 0]) * (pv[:, 2] - pv[:, 0])
                    - (pv[:, 1] - pv[:, 0]) * (pu[:, 2] - pu[:, 0]))
            ok &= jnp.abs(area) > 1e-12

            def edge(a, b):  # signed area of (a, b, pixel), (C, S, S)
                return ((pu[:, b] - pu[:, a])[:, None, None] * (gy - pv[:, a][:, None, None])
                        - (pv[:, b] - pv[:, a])[:, None, None] * (gx - pu[:, a][:, None, None]))

            e0 = edge(1, 2)
            e1 = edge(2, 0)
            e2 = edge(0, 1)
            sgn = jnp.sign(area)[:, None, None]
            inside = (e0 * sgn >= 0) & (e1 * sgn >= 0) & (e2 * sgn >= 0)
            inv_area = jnp.where(ok, 1.0 / jnp.where(ok, area, 1.0), 0.0)
            invz = (e0 * ww[:, 0][:, None, None] + e1 * ww[:, 1][:, None, None]
                    + e2 * ww[:, 2][:, None, None]) * inv_area[:, None, None]
            hit = inside & (invz > 1e-12) & ok[:, None, None]
            zpix = jnp.where(hit, 1.0 / jnp.maximum(invz, 1e-12), jnp.inf)
            return jnp.minimum(zbuf, zpix.min(axis=0)), None

        zbuf, _ = jax.lax.scan(body, jnp.full((S, S), jnp.inf, jnp.float32), f)
        return jnp.where(jnp.isfinite(zbuf), zbuf, 0.0)

    return jax.vmap(one)(R, t, fx, fy, cx, cy)
