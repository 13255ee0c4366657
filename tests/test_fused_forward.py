"""Fused-Pallas inference forward vs the standard XLA forward."""
import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.models import PoseNet
from checkerpose_tpu.models.fused import build_fused_registry, fused_edgeconv, make_fused_pose_forward
from checkerpose_tpu.ops.knn import knn_index
from checkerpose_tpu.ops.geometry import pc_normalize
from checkerpose_tpu.train import steps
from checkerpose_tpu.train.state import create_pose_state, make_optimizer

NPT, CROP = 16, 256


def test_fused_forward_matches_xla():
    rng = np.random.default_rng(0)
    p3d = rng.uniform(-30, 30, (NPT, 3)).astype(np.float32)
    p3dn = pc_normalize(p3d).astype(np.float32)
    knn = knn_index(p3dn, 5)
    net = PoseNet(npoint=NPT, res_log2=6, backbone_name="resnet34",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    st = create_pose_state(net, knn, CROP, make_optimizer(1e-4), NPT)
    variables = st.variables()

    reg = build_fused_registry(variables, knn, tile_n=NPT, dtype=jnp.float32)
    # one EdgeConv in init_net + one per refine step (3)
    assert len(reg) == 4, sorted(reg)
    assert ("init_net", "graph_0") in reg

    batch = {
        "image": rng.integers(0, 255, (2, CROP, CROP, 3)).astype(np.uint8),
        "p3d_normed": np.tile(p3dn[None], (2, 1, 1)),
    }
    fwd = steps.make_pose_forward(net, knn, stage=3)
    ref = fwd(variables, batch)
    fused_fwd = make_fused_pose_forward(net, knn, 3, variables,
                                        tile_n=NPT, dtype=jnp.float32)
    out = fused_fwd(variables, batch)
    # hard integer ids must agree except where logits sit within fused-vs-XLA
    # numeric tolerance of the 0 threshold; demand near-total agreement
    agree = (np.asarray(out["x_id"]) == np.asarray(ref["x_id"])).mean()
    assert agree > 0.95, agree
    np.testing.assert_allclose(np.asarray(out["seg_visib"]),
                               np.asarray(ref["seg_visib"]), atol=2e-2)
