"""Initial keypoint localization net (coarse 8x8 binary codes).

TPU-native redesign of the reference `InitNet_GNN` (`model/init.py:71-128`):
backbone stride-32 map (B, 8, 8, C) -> 1x1 conv to npoint channels -> each
keypoint's 8x8 response map flattened to its 64-d graph feature -> EdgeConv
stack over the static keypoint KNN graph -> per-keypoint Dense emitting
1 + 2*res_log2 bit logits.

Output layout is (B, N, num_bits) (keypoint-major, bits last) throughout the
framework; bit 0 = in-RoI, bits 1..res_log2 = x code (MSB first), rest = y.
"""
from __future__ import annotations

from typing import Any, Tuple

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from checkerpose_tpu.models.backbone import make_backbone
from checkerpose_tpu.models.graph import EdgeConv


class InitNet(nn.Module):
    npoint: int
    res_log2: int = 3
    backbone_name: str = "resnet34"
    num_conv1x1: int = 1
    num_graph_module: int = 2
    graph_leaky_slope: float = 0.2
    dtype: Any = jnp.bfloat16

    @property
    def num_out_bits(self) -> int:
        return 1 + 2 * self.res_log2

    @nn.compact
    def __call__(self, img: jnp.ndarray, knn_idx, train: bool = False):
        """img: (B, H, W, 3) normalized float. knn_idx: static (N, K) int.

        Returns (bits (B, N, 1+2*res_log2) f32 logits, feats list, graph_feat
        (B, N, 64)).
        """
        backbone = make_backbone(self.backbone_name, dtype=self.dtype)
        feats = backbone(img.astype(self.dtype), train)
        x = feats[-1]  # (B, 8, 8, C)

        # 1x1 conv(s) to npoint channels (reference model/init.py:84-94)
        x = nn.Conv(self.npoint, (1, 1), dtype=self.dtype, name="conv1x1_0")(x)
        for i in range(1, self.num_conv1x1):
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = nn.Conv(self.npoint, (1, 1), dtype=self.dtype, name=f"conv1x1_{i}")(x)

        # per-keypoint 64-d feature = its own 8x8 map flattened; the
        # architecture ties crop size to 32*8=256 via this reshape, exactly
        # like the reference (`model/init.py:114` hardcodes 64 = 8*8); the
        # refine gathers also rely on map resolution == 2**(3+step+1)
        B, H, W, N = x.shape
        g = x.transpose(0, 3, 1, 2).reshape(B, N, H * W)  # (B, N, H*W)
        # expose the per-keypoint response maps for the optional auxiliary
        # heatmap loss (train/steps.py): dense per-channel supervision that
        # breaks the three-way backbone/conv1x1/decoder co-adaptation deadlock
        # when no ImageNet-pretrained backbone is available (this environment
        # has no timm weights; the reference always starts from ImageNet,
        # model/backbone.py:39-50). Reading it is opt-in via
        # mutable=["intermediates"]; inference paths are unaffected.
        self.sow("intermediates", "resp_map", g)

        for i in range(self.num_graph_module):
            # onehot_gather=False: the one-hot per-sample gather inside the
            # init net blew the cli.pretrain_lm first-step XLA compile past
            # 50 min (round 4); its K-gather is tiny, so take_along_axis
            # here, one-hot only in the refine GNN (models/graph.py).
            g = EdgeConv(64, self.graph_leaky_slope, dtype=self.dtype,
                         onehot_gather=False,
                         name=f"graph_{i}")(g, knn_idx, train)

        bits = nn.Dense(self.num_out_bits, dtype=jnp.float32, name="mlp")(
            g.astype(jnp.float32))
        return bits, feats, g
