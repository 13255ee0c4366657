import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.models import InitNet
from checkerpose_tpu.models.convert import convert_resnet34, graft_backbone
from checkerpose_tpu.ops.knn import knn_index


def _fake_torch_resnet34_sd(rng):
    """Random torchvision-layout ResNet-34 state dict (numpy)."""
    sd = {}

    def conv(k, o, i, kh, kw):
        sd[k + ".weight"] = rng.standard_normal((o, i, kh, kw)).astype(np.float32)

    def bn(k, c):
        sd[k + ".weight"] = rng.standard_normal(c).astype(np.float32)
        sd[k + ".bias"] = rng.standard_normal(c).astype(np.float32)
        sd[k + ".running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[k + ".running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5

    conv("conv1", 64, 3, 7, 7)
    bn("bn1", 64)
    widths = [64, 128, 256, 512]
    blocks = [3, 4, 6, 3]
    in_w = 64
    for s, (w, nb) in enumerate(zip(widths, blocks)):
        for b in range(nb):
            pre = f"layer{s + 1}.{b}"
            cin = in_w if b == 0 else w
            conv(f"{pre}.conv1", w, cin, 3, 3)
            bn(f"{pre}.bn1", w)
            conv(f"{pre}.conv2", w, w, 3, 3)
            bn(f"{pre}.bn2", w)
            if b == 0 and cin != w:
                conv(f"{pre}.downsample.0", w, cin, 1, 1)
                bn(f"{pre}.downsample.1", w)
        in_w = w
    return sd


def test_convert_and_graft_resnet34():
    rng = np.random.default_rng(0)
    sd = _fake_torch_resnet34_sd(rng)
    bk_params, bk_stats = convert_resnet34(sd)

    p3d = rng.standard_normal((16, 3)).astype(np.float32)
    knn = knn_index(p3d, 5)
    net = InitNet(npoint=16, res_log2=3, backbone_name="resnet34",
                  num_graph_module=1, dtype=jnp.float32)
    img = jnp.zeros((1, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), img, knn, train=False)
    params = {"init_net": variables["params"]}  # emulate PoseNet nesting
    stats = {"init_net": variables["batch_stats"]}
    # the InitNet's own backbone lives at params["backbone"]
    params = {"init_net": {"backbone": variables["params"]["backbone"]}}
    stats = {"init_net": {"backbone": variables["batch_stats"]["backbone"]}}

    new_p, new_s = graft_backbone(params, stats, bk_params, bk_stats)
    # a grafted conv kernel matches the transposed torch weight
    k = np.asarray(new_p["init_net"]["backbone"]["stem"]["conv"]["kernel"])
    np.testing.assert_array_equal(k, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    m = np.asarray(new_s["init_net"]["backbone"]["layer2_block0"]["conv1"]["bn"]["mean"])
    np.testing.assert_array_equal(m, sd["layer2.0.bn1.running_mean"])


def test_convert_shape_mismatch_raises():
    rng = np.random.default_rng(1)
    sd = _fake_torch_resnet34_sd(rng)
    bk_params, bk_stats = convert_resnet34(sd)
    bad = {"stem": {"conv": {"kernel": np.zeros((1, 1, 1, 1), np.float32)}}}
    import pytest
    with pytest.raises((ValueError, KeyError)):
        graft_backbone({"init_net": {"backbone": bad}},
                       {"init_net": {"backbone": {}}}, bk_params, bk_stats)
