"""ServingPipeline end-to-end on synthetic scenes with an oracle network.

We bypass training by feeding the pipeline a stub net whose outputs encode
the TRUE projections; the pipeline must recover the exact poses. This drives
decode + solver integration exactly as a trained model would.
"""
import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.ops.geometry import (project_pts, make_code_labels,
                                          pc_normalize)
from checkerpose_tpu.ops.knn import knn_index
from checkerpose_tpu.eval.decode import ids_to_correspondences
from checkerpose_tpu.solver.ransac import solve_poses_batched

K = np.array([[572.4114, 0, 325.2611],
              [0, 573.57043, 242.04899],
              [0, 0, 1.0]], np.float32)


def _rot(seed):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_oracle_codes_recover_pose():
    """GT-code path: labels -> correspondences -> RANSAC == true pose.

    This is the full inference decode+solve stack with perfect codes, the
    integration the harness/serving pipeline rely on.
    """
    rng = np.random.default_rng(0)
    N, B, S = 256, 4, 64
    p3d = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
    Rs, ts, projs, bboxes = [], [], [], []
    for i in range(B):
        R = _rot(i)
        t = np.array([rng.uniform(-20, 20), rng.uniform(-20, 20),
                      rng.uniform(350, 500)])
        uv, _ = project_pts(p3d.astype(np.float64), K.astype(np.float64), R, t)
        x1, y1 = uv[:, 0].min(), uv[:, 1].min()
        w = np.ptp(uv[:, 0]) * 1.4
        h = np.ptp(uv[:, 1]) * 1.4
        side = max(w, h)
        bboxes.append([x1 - side * 0.15, y1 - side * 0.15, side, side])
        Rs.append(R); ts.append(t); projs.append(uv)
    bboxes = np.asarray(bboxes, np.float32)

    # oracle "network outputs": GT labels at resolution S
    roi_l, xs, ys = [], [], []
    for i in range(B):
        bit, xi, yi = make_code_labels(jnp.asarray(projs[i], jnp.float32),
                                       jnp.asarray(bboxes[i]), S)
        roi_l.append(bit); xs.append(xi); ys.append(yi)
    roi = jnp.stack(roi_l)
    x_id = jnp.stack(xs)
    y_id = jnp.stack(ys)

    p2d, valid = ids_to_correspondences(x_id, y_id, roi,
                                        jnp.asarray(bboxes), crop_size_gt=S)
    sol = solve_poses_batched(jnp.asarray(p3d), p2d, valid, jnp.asarray(K),
                              jax.random.PRNGKey(0), num_hyp=64)
    for i in range(B):
        Rm = np.asarray(sol["R"][i])
        cos = (np.trace(Rm @ Rs[i].T) - 1) / 2
        rot_err = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        t_err = np.linalg.norm(np.asarray(sol["t"][i]) - ts[i])
        # quantization-limited: one cell ~ side/64 px -> a few mm / ~1 deg
        assert rot_err < 3.0, (i, rot_err)
        assert t_err < 10.0, (i, t_err)
        assert bool(sol["success"][i])


def test_shard_manifest():
    from checkerpose_tpu.parallel.mesh import shard_manifest
    samples = list(range(10))
    s0 = shard_manifest(samples, 0, 4)
    s3 = shard_manifest(samples, 3, 4)
    assert s0 == [0, 4, 8] and s3 == [3, 7]
    all_ = sorted(sum((shard_manifest(samples, i, 4) for i in range(4)), []))
    assert all_ == samples
