"""HRNet-w18 timm-checkpoint conversion round-trip (VERDICT round-1 item 3).

No timm (or weight files) ship in this image, so the test builds a random
state dict in the exact timm `hrnet_w18` layout (key names + shapes from
timm/models/hrnet.py HighResolutionNet) and asserts the converted tree maps
1:1 onto models.hrnet.HRNetFeatures — full leaf coverage in BOTH directions,
so a real timm checkpoint is guaranteed to land on every backbone parameter.
"""
import numpy as np
import jax
import jax.numpy as jnp

from checkerpose_tpu.models.convert import convert_hrnet_w18, graft_backbone
from checkerpose_tpu.models.hrnet import HRNetFeatures

W18 = (18, 36, 72, 144)
STAGE_MODULES = (1, 4, 3)


def _fake_timm_hrnet_w18_sd(rng, benign=False):
    """benign=True keeps activations bounded through the ~70 conv+BN layers
    (random running stats compound exponentially otherwise)."""
    sd = {}

    def conv(k, o, i, kh, kw):
        w = rng.standard_normal((o, i, kh, kw)).astype(np.float32)
        sd[k + ".weight"] = w * (2.0 / (i * kh * kw)) ** 0.5 if benign else w

    def bn(k, c):
        if benign:
            sd[k + ".weight"] = np.ones(c, np.float32)
            sd[k + ".bias"] = np.zeros(c, np.float32)
            sd[k + ".running_mean"] = np.zeros(c, np.float32)
            sd[k + ".running_var"] = np.ones(c, np.float32)
            return
        sd[k + ".weight"] = rng.standard_normal(c).astype(np.float32)
        sd[k + ".bias"] = rng.standard_normal(c).astype(np.float32)
        sd[k + ".running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[k + ".running_var"] = np.abs(rng.standard_normal(c)).astype(np.float32) + 0.5

    def bottleneck(pre, cin, planes, cout):
        conv(f"{pre}.conv1", planes, cin, 1, 1)
        bn(f"{pre}.bn1", planes)
        conv(f"{pre}.conv2", planes, planes, 3, 3)
        bn(f"{pre}.bn2", planes)
        conv(f"{pre}.conv3", cout, planes, 1, 1)
        bn(f"{pre}.bn3", cout)
        if cin != cout:
            conv(f"{pre}.downsample.0", cout, cin, 1, 1)
            bn(f"{pre}.downsample.1", cout)

    def basicblock(pre, w):
        conv(f"{pre}.conv1", w, w, 3, 3)
        bn(f"{pre}.bn1", w)
        conv(f"{pre}.conv2", w, w, 3, 3)
        bn(f"{pre}.bn2", w)

    conv("conv1", 64, 3, 3, 3)
    bn("bn1", 64)
    conv("conv2", 64, 64, 3, 3)
    bn("bn2", 64)
    for k in range(4):
        bottleneck(f"layer1.{k}", 64 if k == 0 else 256, 64, 256)

    prev_out = (256,)
    for stage in range(3):
        n_br = stage + 2
        ws = W18[:n_br]
        # transitions: adapt conv only when the branch width changes
        for b in range(n_br - 1):
            if prev_out[b] != ws[b]:
                conv(f"transition{stage + 1}.{b}.0", ws[b], prev_out[b], 3, 3)
                bn(f"transition{stage + 1}.{b}.1", ws[b])
        conv(f"transition{stage + 1}.{n_br - 1}.0.0", ws[-1], prev_out[-1], 3, 3)
        bn(f"transition{stage + 1}.{n_br - 1}.0.1", ws[-1])
        for m in range(STAGE_MODULES[stage]):
            pre = f"stage{stage + 2}.{m}"
            for b in range(n_br):
                for k in range(4):
                    basicblock(f"{pre}.branches.{b}.{k}", ws[b])
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        conv(f"{pre}.fuse_layers.{i}.{j}.0", ws[i], ws[j], 1, 1)
                        bn(f"{pre}.fuse_layers.{i}.{j}.1", ws[i])
                    elif j < i:
                        for step in range(i - j):
                            last = step == i - j - 1
                            conv(f"{pre}.fuse_layers.{i}.{j}.{step}.0",
                                 ws[i] if last else ws[j], ws[j], 3, 3)
                            bn(f"{pre}.fuse_layers.{i}.{j}.{step}.1",
                               ws[i] if last else ws[j])
        prev_out = ws
    for b in range(4):
        bottleneck(f"incre_modules.{b}.0", W18[b], 32 * 2 ** b, 128 * 2 ** b)
    return sd


def _leaf_paths(tree, prefix=""):
    out = set()
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out |= _leaf_paths(v, p)
        else:
            out.add((p, tuple(np.shape(v))))
    return out


def test_convert_hrnet_w18_full_coverage():
    rng = np.random.default_rng(0)
    sd = _fake_timm_hrnet_w18_sd(rng)
    bk_params, bk_stats = convert_hrnet_w18(sd)

    net = HRNetFeatures(name_cfg="hrnet_w18", dtype=jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)

    # 1:1 leaf coverage, both directions, shapes included
    assert _leaf_paths(bk_params) == _leaf_paths(variables["params"])
    assert _leaf_paths(bk_stats) == _leaf_paths(variables["batch_stats"])

    # grafting succeeds and lands the actual tensors
    params = {"init_net": {"backbone": variables["params"]}}
    stats = {"init_net": {"backbone": variables["batch_stats"]}}
    new_p, new_s = graft_backbone(params, stats, bk_params, bk_stats)
    k = np.asarray(new_p["init_net"]["backbone"]["stem1"]["conv"]["kernel"])
    np.testing.assert_array_equal(k, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    f = new_p["init_net"]["backbone"]["stage3_module2"]["fuse"]["down_0_to_2_1"]
    np.testing.assert_array_equal(
        np.asarray(f["conv"]["kernel"]),
        np.transpose(sd["stage3.2.fuse_layers.2.0.1.0.weight"], (2, 3, 1, 0)))
    m = np.asarray(new_s["init_net"]["backbone"]["incre3"]["conv2"]["bn"]["mean"])
    np.testing.assert_array_equal(m, sd["incre_modules.3.0.bn2.running_mean"])

    # converted stats leaves count equals model stats leaves (nothing dropped)
    assert len(_leaf_paths(bk_stats)) == len(_leaf_paths(variables["batch_stats"]))


def test_converted_backbone_runs():
    """Grafted weights must produce finite features at the documented
    channel widths (128/256/512/1024, reference model/pipeline.py:12)."""
    rng = np.random.default_rng(1)
    sd = _fake_timm_hrnet_w18_sd(rng, benign=True)
    bk_params, bk_stats = convert_hrnet_w18(sd)
    net = HRNetFeatures(name_cfg="hrnet_w18", dtype=jnp.float32)
    variables = {"params": jax.tree.map(jnp.asarray, bk_params),
                 "batch_stats": jax.tree.map(jnp.asarray, bk_stats)}
    feats = net.apply(variables, jnp.ones((1, 64, 64, 3)) * 0.1, train=False)
    assert [f.shape[-1] for f in feats] == [128, 256, 512, 1024]
    assert [f.shape[1] for f in feats] == [16, 8, 4, 2]
    for f in feats:
        assert bool(jnp.isfinite(f).all())
