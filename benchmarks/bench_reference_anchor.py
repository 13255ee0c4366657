"""MEASURED anchor for the reference protocol's throughput (VERDICT r4 #8).

The reference evaluates batch-1, synchronously, with a per-image HOST
OpenCV PnP (`/root/reference/checkerpose/test.py:198`,
`test_network_with_test_data.py:103-107`: `cv2.solvePnPRansac(...,
SOLVEPNP_EPNP, reprojectionError=2, iterationsCount=150)`), so its
protocol throughput is bounded above by 1 / t_pnp REGARDLESS of the GPU:
the solver runs serially on the CPU between forwards. This bench measures
that exact call on THIS host with reference-shaped inputs (N=512
correspondences, 2 px noise, 20% outliers) — a hard, measured component of
the baseline instead of a guessed 40 crops/s.

Also measured, clearly labeled: our flagship forward at batch 1 on this
host's CPU (a same-host NN floor; the reference's GPU forward is faster
than CPU but cannot beat the PnP bound above in the serial protocol).

Run (quiet window; pure CPU):
  CHECKERPOSE_PLATFORM=cpu python benchmarks/bench_reference_anchor.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("CHECKERPOSE_PLATFORM", "cpu")

import numpy as np
import cv2


def bench_opencv_pnp(n_img: int = 200, npts: int = 512, outlier_frac: float = 0.2,
                     noise_px: float = 2.0):
    rng = np.random.default_rng(0)
    K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]], np.float64)
    times = []
    for i in range(n_img):
        sphere = rng.standard_normal((npts, 3))
        sphere /= np.linalg.norm(sphere, axis=1, keepdims=True)
        p3d = sphere * rng.uniform(20, 30)
        Q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = np.array([rng.uniform(-30, 30), rng.uniform(-30, 30),
                      rng.uniform(380, 520)])
        cam = p3d @ Q.T + t
        uv = cam @ K.T
        uv = uv[:, :2] / uv[:, 2:3]
        uv += rng.normal(0, noise_px, uv.shape)
        n_out = int(outlier_frac * npts)
        idx = rng.choice(npts, n_out, replace=False)
        uv[idx] += rng.uniform(-60, 60, (n_out, 2))
        t0 = time.perf_counter()
        cv2.solvePnPRansac(
            p3d.astype(np.float64), uv.astype(np.float64), K, None,
            flags=cv2.SOLVEPNP_EPNP, reprojectionError=2.0,
            iterationsCount=150)
        times.append(time.perf_counter() - t0)
    times = np.array(times[10:]) * 1000.0   # drop warmup
    return {"mean_ms": float(times.mean()), "p50_ms": float(np.median(times)),
            "p90_ms": float(np.percentile(times, 90))}


def bench_flagship_forward_cpu(n_iter: int = 10):
    import jax
    import jax.numpy as jnp
    from checkerpose_tpu.models import PoseNet
    from checkerpose_tpu.ops.knn import knn_index

    rng = np.random.default_rng(0)
    p3d = rng.uniform(-30, 30, (512, 3)).astype(np.float32)
    p3dn = (p3d - p3d.mean(0)) / np.abs(p3d).max()
    knn = knn_index(p3dn, 20)
    net = PoseNet(npoint=512, res_log2=6, backbone_name="hrnet_w18",
                  num_graph_module=3, init_num_graph_module=2)
    variables = jax.jit(net.init, static_argnames=("stage", "train"))(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 256, 3), jnp.float32), knn,
        jnp.asarray(p3dn)[None], stage=3, train=False)

    @jax.jit
    def fwd(v, img, pn):
        out = net.apply(v, img, knn, pn, stage=3, train=False)
        return out["x_id"]

    img = jnp.asarray(rng.standard_normal((1, 256, 256, 3)), jnp.float32)
    pn = jnp.asarray(p3dn)[None]
    float(jnp.sum(fwd(variables, img, pn)))      # compile
    t0 = time.perf_counter()
    for _ in range(n_iter):
        float(jnp.sum(fwd(variables, img, pn)))  # host-sync each iter
    return {"mean_ms": (time.perf_counter() - t0) / n_iter * 1000.0}


def main():
    pnp = bench_opencv_pnp()
    print(json.dumps({"bench": "opencv_epnp_ransac_per_image",
                      "params": "EPnP reprojErr=2 iters=150 N=512 20%outliers",
                      **pnp}), flush=True)
    print(json.dumps({
        "bench": "reference_protocol_throughput_bound",
        "note": "reference test loop is batch-1 serial host PnP; upper bound "
                "= 1000/pnp_mean_ms crops/s even with an infinitely fast GPU",
        "bound_crops_per_s": 1000.0 / pnp["mean_ms"]}), flush=True)
    if os.environ.get("SKIP_FWD") != "1":
        fw = bench_flagship_forward_cpu()
        print(json.dumps({"bench": "flagship_forward_batch1_cpu_thishost",
                          **fw}), flush=True)


if __name__ == "__main__":
    main()
