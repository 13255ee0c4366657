"""Batched RANSAC-EPnP micro-benchmark (honest host-synced timing).

Usage: python benchmarks/bench_solver.py [--batch 64] [--num_hyp 128]
Prints ms/batch, solves/s, and rotation-error stats on a synthetic scene
with 30% outliers + 1px noise + 10% invalid points.
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from checkerpose_tpu.solver.ransac import solve_poses_batched


def main(B=64, N=512, num_hyp=128, reps=20, seed=0, refine_iters=8,
         reseed=True, n_backtrack=3, irls_rounds=2):
    rng = np.random.default_rng(seed)
    p3d = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
    K = np.array([[572.4, 0, 325.2], [0, 573.6, 242.0], [0, 0, 1]], np.float32)
    Rs, p2ds, valids = [], [], []
    for _ in range(B):
        A = rng.standard_normal((3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = np.array([rng.uniform(-50, 50), rng.uniform(-40, 40),
                      rng.uniform(350, 550)])
        cam = p3d @ Q.T + t
        uv = cam @ K.T
        uv = uv[:, :2] / uv[:, 2:]
        uv += rng.normal(0, 1.0, uv.shape)
        out = rng.random(N) < 0.3
        uv[out] += rng.uniform(-200, 200, (int(out.sum()), 2))
        Rs.append(Q)
        p2ds.append(uv)
        valids.append(rng.random(N) < 0.9)
    p2d = jnp.asarray(np.stack(p2ds), jnp.float32)
    valid = jnp.asarray(np.stack(valids), jnp.float32)
    key = jax.random.PRNGKey(0)

    kw = dict(num_hyp=num_hyp, refine_iters=refine_iters, reseed=reseed,
              n_backtrack=n_backtrack, irls_rounds=irls_rounds)
    sol = solve_poses_batched(jnp.asarray(p3d), p2d, valid, jnp.asarray(K),
                              key, **kw)
    _ = float(jnp.sum(sol["t"]))  # sync (block_until_ready lies on this tunnel)
    t0 = time.perf_counter()
    for i in range(reps):
        sol = solve_poses_batched(jnp.asarray(p3d), p2d, valid, jnp.asarray(K),
                                  jax.random.fold_in(key, i), **kw)
        _ = float(jnp.sum(sol["t"]))
    dt = (time.perf_counter() - t0) / reps
    Re = np.asarray(sol["R"])
    ang = [np.degrees(np.arccos(np.clip((np.trace(a.T @ b) - 1) / 2, -1, 1)))
           for a, b in zip(Re, Rs)]
    print(f"solver batch {B} (N={N}, hyp={num_hyp}, gn={refine_iters}, "
          f"reseed={reseed}, bt={n_backtrack}, irls={irls_rounds}): "
          f"{dt*1000:.1f} ms = {B/dt:.0f} solves/s; rot err mean "
          f"{np.mean(ang):.3f} deg, median {np.median(ang):.3f}, "
          f"max {np.max(ang):.3f}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--num_hyp", type=int, default=128)
    p.add_argument("--npoint", type=int, default=512)
    p.add_argument("--refine_iters", type=int, default=8)
    p.add_argument("--no_reseed", action="store_true")
    p.add_argument("--n_backtrack", type=int, default=3)
    p.add_argument("--irls_rounds", type=int, default=2)
    a = p.parse_args()
    main(B=a.batch, num_hyp=a.num_hyp, N=a.npoint, refine_iters=a.refine_iters,
         reseed=not a.no_reseed, n_backtrack=a.n_backtrack,
         irls_rounds=a.irls_rounds)
