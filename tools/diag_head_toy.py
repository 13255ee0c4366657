"""Diagnostic: head-only learnability with a PERFECT backbone.

Synthesizes ideal 8x8 'backbone features': a z-buffered NOCS rendering of the
real synth object at 8x8, lifted per-cell through fixed random Fourier color
features (emulating color-selective backbone units). Trains the init head
(conv1x1 C->npt, 2x EdgeConv, shared linear -> 7 bits) on infinite fresh
samples. Compares our JAX head against a line-for-line torch mirror of the
reference head (model/init.py:54-128) on identical data.

If torch learns and JAX doesn't -> bug in our head stack.
If neither learns -> keypoint-binding is the bottleneck even with perfect
features (backbone not to blame).
If both learn -> the backbone (from-scratch training) is the bottleneck.

Usage: python tools/diag_head_toy.py --impl jax|torch [--steps 2000]
"""
import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

p = argparse.ArgumentParser()
p.add_argument("--impl", choices=["jax", "torch"], required=True)
p.add_argument("--steps", type=int, default=2000)
p.add_argument("--lr", type=float, default=2e-4)
p.add_argument("--batch", type=int, default=64)
p.add_argument("--npt", type=int, default=512)
p.add_argument("--feat_dim", type=int, default=64)
p.add_argument("--platform", default="cpu")
args = p.parse_args()
os.environ.setdefault("CHECKERPOSE_PLATFORM", args.platform)

from checkerpose_tpu.data.ply import load_ply_vertices  # noqa: E402
from checkerpose_tpu.ops.knn import knn_index  # noqa: E402
from checkerpose_tpu.ops.geometry import pc_normalize  # noqa: E402

ROOT = "/tmp/synth_scale3/synth"
verts = load_ply_vertices(os.path.join(ROOT, "models", "obj_000001.ply"))
if isinstance(verts, tuple):
    verts = verts[0]
fps = pickle.load(open(os.path.join(ROOT, "fps_202212", "obj_000001.pkl"), "rb"))
kp_idx = fps["id"][:args.npt]
lo, hi = verts.min(0), verts.max(0)
nocs = (verts - lo) / (hi - lo + 1e-9)          # (V,3) in [0,1]
r = np.abs(verts).max() * 1.05

knn = knn_index(pc_normalize(verts[kp_idx]), 20)  # (npt, 20)

rng = np.random.default_rng(0)
W_rff = rng.standard_normal((3, args.feat_dim)) * 3.0
b_rff = rng.uniform(0, 2 * np.pi, args.feat_dim)


def make_batch(rng, B):
    """Returns feats (B,8,8,F), roi (B,npt), x_id/y_id (B,npt) in [0,8)."""
    feats = np.zeros((B, 8, 8, args.feat_dim), np.float32)
    xs = np.zeros((B, args.npt), np.int64)
    ys = np.zeros((B, args.npt), np.int64)
    for b in range(B):
        A = rng.standard_normal((3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        cam = verts @ Q.T                         # orthographic
        u = (cam[:, 0] + r) / (2 * r) * 8.0
        v = (cam[:, 1] + r) / (2 * r) * 8.0
        cu = np.clip(u.astype(int), 0, 7)
        cv = np.clip(v.astype(int), 0, 7)
        depth = cam[:, 2]
        cells = cv * 8 + cu
        order = np.argsort(depth)                 # near first; first hit wins
        uniq, first = np.unique(cells[order], return_index=True)
        winners = order[first]
        cbuf = np.zeros((64, 3), np.float32)
        occ = np.zeros(64, bool)
        cbuf[uniq] = nocs[winners]
        occ[uniq] = True
        cbuf = cbuf.reshape(8, 8, 3)
        feats[b] = np.cos(cbuf @ W_rff + b_rff) * occ.reshape(8, 8, 1)[..., :]
        xs[b] = cu[kp_idx]
        ys[b] = cv[kp_idx]
    return feats, xs, ys


def to_bits(ids):  # (B,N) int -> (B,N,3) float MSB first
    return np.stack([(ids >> (2 - k)) & 1 for k in range(3)], -1).astype(np.float32)


if args.impl == "jax":
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    import optax
    from checkerpose_tpu.models.graph import EdgeConv

    class Head(nn.Module):
        npt: int

        @nn.compact
        def __call__(self, f, train=True):
            x = nn.Conv(self.npt, (1, 1), name="conv1x1_0")(f)
            B, H, Wd, N = x.shape
            g = x.transpose(0, 3, 1, 2).reshape(B, N, H * Wd)
            for i in range(2):
                g = EdgeConv(64, 0.2, dtype=jnp.float32, name=f"graph_{i}")(g, knn, train)
            return nn.Dense(7, name="mlp")(g)

    net = Head(args.npt)
    key = jax.random.PRNGKey(0)
    variables = net.init(key, jnp.zeros((1, 8, 8, args.feat_dim)), train=False)
    params, bs = variables["params"], variables["batch_stats"]
    opt = optax.adam(args.lr)
    ost = opt.init(params)

    @jax.jit
    def step(params, bs, ost, f, gx, gy):
        def loss_fn(p):
            bits, upd = net.apply({"params": p, "batch_stats": bs}, f,
                                  train=True, mutable=["batch_stats"])
            lx = optax.sigmoid_binary_cross_entropy(bits[..., 1:4], gx).mean()
            ly = optax.sigmoid_binary_cross_entropy(bits[..., 4:7], gy).mean()
            errx = jnp.mean((bits[..., 1:4] > 0) != (gx > 0.5))
            return lx + ly, (upd["batch_stats"], lx + ly, errx)
        (l, (nbs, tot, errx)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, nost = opt.update(grads, ost, params)
        return optax.apply_updates(params, upd), nbs, nost, tot, errx

    t0 = time.time()
    for i in range(1, args.steps + 1):
        f, xs, ysd = make_batch(rng, args.batch)
        params, bs, ost, l, errx = step(params, bs, ost, jnp.asarray(f),
                                        jnp.asarray(to_bits(xs)), jnp.asarray(to_bits(ysd)))
        if i % 100 == 0 or i == 1:
            print(f"[jax] step {i}: loss={float(l):.4f} x_bit_err={float(errx):.3f} "
                  f"({(time.time()-t0)/i:.3f}s/step)", flush=True)
else:
    import torch
    import torch.nn as tnn

    class StaticGraph(tnn.Module):
        def __init__(self, knn_idx):
            super().__init__()
            self.register_buffer("knn", torch.as_tensor(knn_idx, dtype=torch.long))
            self.conv = tnn.Sequential(
                tnn.Conv2d(128, 64, 1, bias=False), tnn.BatchNorm2d(64),
                tnn.LeakyReLU(0.2))

        def forward(self, x):                      # x (B, C, N)
            B, C, N = x.shape
            nb = x[:, :, self.knn]                 # (B, C, N, K)
            ctr = x.unsqueeze(-1).expand_as(nb)
            e = torch.cat([nb - ctr, ctr], 1)      # (B, 2C, N, K)
            return self.conv(e).max(-1)[0]

    class HeadT(tnn.Module):
        def __init__(self, npt):
            super().__init__()
            self.conv1x1 = tnn.Conv2d(args.feat_dim, npt, 1)
            self.g0 = StaticGraph(knn)
            self.g1 = StaticGraph(knn)
            self.mlp = tnn.Linear(64, 7)

        def forward(self, f):                      # f (B, F, 8, 8)
            x = self.conv1x1(f)                    # (B, npt, 8, 8)
            B = x.shape[0]
            g = x.view(B, -1, 64).permute(0, 2, 1)  # (B, 64, npt)
            g = self.g0(g)
            g = self.g1(g)
            return self.mlp(g.permute(0, 2, 1))    # (B, npt, 7)

    torch.manual_seed(0)
    net = HeadT(args.npt)
    opt = torch.optim.Adam(net.parameters(), lr=args.lr)
    lossf = tnn.BCEWithLogitsLoss()
    t0 = time.time()
    for i in range(1, args.steps + 1):
        f, xs, ysd = make_batch(rng, args.batch)
        ft = torch.as_tensor(f).permute(0, 3, 1, 2)
        gx = torch.as_tensor(to_bits(xs))
        gy = torch.as_tensor(to_bits(ysd))
        bits = net(ft)
        loss = lossf(bits[..., 1:4], gx) + lossf(bits[..., 4:7], gy)
        opt.zero_grad(); loss.backward(); opt.step()
        if i % 100 == 0 or i == 1:
            with torch.no_grad():
                errx = ((bits[..., 1:4] > 0) != (gx > 0.5)).float().mean()
            print(f"[torch] step {i}: loss={float(loss):.4f} x_bit_err={float(errx):.3f} "
                  f"({(time.time()-t0)/i:.3f}s/step)", flush=True)
