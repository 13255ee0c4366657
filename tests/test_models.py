import numpy as np
import jax
import jax.numpy as jnp
import pytest

from checkerpose_tpu.models import InitNet, PoseNet
from checkerpose_tpu.ops.knn import knn_index


@pytest.fixture(scope="module")
def kp():
    rng = np.random.default_rng(0)
    p3d = rng.standard_normal((32, 3)).astype(np.float32)
    knn = knn_index(p3d, 5)
    return p3d, knn


def test_knn_static_shape(kp):
    p3d, knn = kp
    assert knn.shape == (32, 5)
    # each point is its own nearest neighbor
    np.testing.assert_array_equal(knn[:, 0], np.arange(32))


def test_init_net_shapes(kp):
    p3d, knn = kp
    net = InitNet(npoint=32, res_log2=3, backbone_name="resnet34", dtype=jnp.float32)
    img = jnp.zeros((2, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), img, knn, train=False)
    bits, feats, g = net.apply(vars_, img, knn, train=False)
    assert bits.shape == (2, 32, 7)
    assert g.shape == (2, 32, 64)  # EdgeConv output width is fixed at 64
    assert len(feats) == 4


@pytest.mark.parametrize("stage", [1, 2, 3])
def test_posenet_progressive(kp, stage):
    p3d, knn = kp
    net = PoseNet(npoint=32, res_log2=6, backbone_name="resnet34", dtype=jnp.float32,
                  num_graph_module=1, init_num_graph_module=1)
    img = jnp.zeros((2, 256, 256, 3))
    p3dj = jnp.asarray(p3d)[None].repeat(2, 0)
    vars_ = net.init(jax.random.PRNGKey(0), img, knn, p3dj, stage=stage, train=False)
    out = net.apply(vars_, img, knn, p3dj, stage=stage, train=False)
    assert out["x_logits"].shape == (2, 32, 3 + stage)
    assert out["y_logits"].shape == (2, 32, 3 + stage)
    assert out["roi_logit"].shape == (2, 32, 1)
    res = 2 ** (3 + stage)
    assert int(out["x_id"].max()) < res and int(out["y_id"].max()) < res
    # seg head follows the current refinement resolution
    seg_res = 2 ** (3 + stage) * (2 if stage > 0 else 2)  # img_feat after up
    if stage > 0:
        assert out["seg_logits"].shape == (2, 2 ** (3 + stage), 2 ** (3 + stage), 2)


def test_posenet_ids_consistent_with_bits(kp):
    """Final integer ids must equal the decoded hard bits of the logits."""
    p3d, knn = kp
    net = PoseNet(npoint=32, res_log2=4, backbone_name="resnet34", dtype=jnp.float32,
                  num_graph_module=1, init_num_graph_module=1)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 256, 3))
    p3dj = jnp.asarray(p3d)[None]
    vars_ = net.init(jax.random.PRNGKey(0), img, knn, p3dj, stage=1, train=False)
    out = net.apply(vars_, img, knn, p3dj, stage=1, train=False)
    from checkerpose_tpu.ops.codes import logits_to_ids
    np.testing.assert_array_equal(np.asarray(out["x_id"]),
                                  np.asarray(logits_to_ids(out["x_logits"])))


def test_hrnet_backbone_shapes():
    from checkerpose_tpu.models.backbone import make_backbone
    net = make_backbone("hrnet_w18_small", dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), img, train=False)
    feats = net.apply(vars_, img, train=False)
    assert [f.shape[-1] for f in feats] == [128, 256, 512, 1024]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]


@pytest.mark.parametrize("name,n_feats,last_ch", [
    ("convnext_tiny", 3, 768),
    ("darknet53", 5, 1024),
])
def test_other_backbones(name, n_feats, last_ch):
    from checkerpose_tpu.models.backbone import make_backbone, BACKBONE_FEAT_DIMS
    net = make_backbone(name, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    vars_ = net.init(jax.random.PRNGKey(0), img, False)
    feats = net.apply(vars_, img, False)
    assert len(feats) == n_feats
    assert [f.shape[-1] for f in feats] == BACKBONE_FEAT_DIMS[name]
    assert feats[-1].shape[1] == 2  # stride 32 on 64px input


def test_posenet_with_convnext():
    """Progressive refinement works on a 3-map pyramid (strides 8/16/32)."""
    rng = np.random.default_rng(0)
    p3d = rng.standard_normal((16, 3)).astype(np.float32)
    knn = knn_index(p3d, 5)
    net = PoseNet(npoint=16, res_log2=6, backbone_name="convnext_tiny",
                  num_graph_module=1, init_num_graph_module=1, dtype=jnp.float32)
    img = jnp.zeros((1, 256, 256, 3))
    p3dj = jnp.asarray(p3d)[None]
    v = net.init(jax.random.PRNGKey(0), img, knn, p3dj, stage=3, train=False)
    out = net.apply(v, img, knn, p3dj, stage=3, train=False)
    assert out["x_logits"].shape == (1, 16, 6)
    assert out["seg_logits"].shape == (1, 64, 64, 2)
