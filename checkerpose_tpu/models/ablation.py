"""Ablation model variants.

PoseNetWoProg: the "without progressive localization" ablation
(reference `PoseNet_GNNskip_ABwoProg`, `model/pipeline_lm.py:430-517`,
cfg `network_type = vanilla_GNNskip_ABwoProg`): the refinement stages only
refine graph FEATURES (EdgeConv stacks, no location-indexed gathers, no
per-stage bit queries); a single final MLP query emits all 1 + 2*res_log2
bit logits at once. Other ablations are config-level: `_woEdgeConv` is
num_graph_module=0, `_woVisibMask`/`_woFullMask` are zero loss weights.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from checkerpose_tpu.models.graph import EdgeConv
from checkerpose_tpu.models.init_net import InitNet
from checkerpose_tpu.models.posenet import UpBlock, _hard_ids


class FeatureRefineBlock(nn.Module):
    """Refine_moduleGNN_ABwoProg (`model/pipeline_lm.py:286-339`): channel
    conversion MLP + EdgeConv stack; no image-feature gather."""
    query_dim: int = 256
    leaky_slope: float = 0.01
    num_graph_module: int = 2
    graph_leaky_slope: float = 0.2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, graph_feat, knn_idx, train: bool):
        x = nn.Dense(self.query_dim, dtype=self.dtype, name="pre_graph_0")(
            graph_feat.astype(self.dtype))
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        x = nn.Dense(self.query_dim, dtype=self.dtype, name="pre_graph_1")(x)
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        for i in range(self.num_graph_module):
            x = EdgeConv(self.query_dim, self.graph_leaky_slope, dtype=self.dtype,
                         name=f"graph_{i}")(x, knn_idx, train)
        return x


class PoseNetWoProg(nn.Module):
    npoint: int
    res_log2: int = 6
    backbone_name: str = "resnet34"
    num_filters: int = 256
    query_dims: Tuple[int, ...] = (256, 256, 64)
    seg_output_dim: int = 2
    leaky_slope: float = 0.01
    num_graph_module: int = 2
    graph_leaky_slope: float = 0.2
    init_num_conv1x1: int = 1
    init_num_graph_module: int = 2
    init_graph_leaky_slope: float = 0.2
    dtype: Any = jnp.bfloat16

    @property
    def num_refine_steps(self) -> int:
        return self.res_log2 - 3

    def output_res_log2(self, stage: Optional[int]) -> int:
        """The single final query head always emits all res_log2 bits, so
        x_id/y_id are at full resolution at EVERY stage (unlike the
        progressive net whose resolution is 2**(3+stage)); the eval harness
        must decode at this resolution or the 2D points scale wrongly."""
        return self.res_log2

    @nn.compact
    def __call__(self, img, knn_idx, p3d_normed=None, stage: Optional[int] = None,
                 train: bool = False):
        num_active = self.num_refine_steps if stage is None else stage
        assert 1 <= num_active <= self.num_refine_steps

        init = InitNet(npoint=self.npoint, res_log2=3, backbone_name=self.backbone_name,
                       num_conv1x1=self.init_num_conv1x1,
                       num_graph_module=self.init_num_graph_module,
                       graph_leaky_slope=self.init_graph_leaky_slope,
                       dtype=self.dtype, name="init_net")
        # init localization discarded; only features kept (reference :497)
        _, feats, graph_feat = init(img, knn_idx, train)

        img_feat = feats[-1]
        for i in range(num_active):
            if i > 0:
                img_feat = jnp.concatenate(
                    [img_feat, feats[-i - 1].astype(img_feat.dtype)], axis=-1)
            img_feat = UpBlock(self.num_filters, is_convtrans=(i == 0),
                               dtype=self.dtype, name=f"up_{i}")(img_feat, train)
            graph_feat = FeatureRefineBlock(
                query_dim=self.query_dims[0], leaky_slope=self.leaky_slope,
                num_graph_module=self.num_graph_module,
                graph_leaky_slope=self.graph_leaky_slope, dtype=self.dtype,
                name=f"refine_{i}")(graph_feat, knn_idx, train)

        seg_logits = nn.Conv(self.seg_output_dim, (1, 1), dtype=jnp.float32,
                             name="seg_block")(img_feat.astype(jnp.float32))

        # single query emits all bits at once (reference :508-513)
        q = graph_feat
        for i, d in enumerate(self.query_dims[1:]):
            q = nn.Dense(d, dtype=self.dtype, name=f"query_{i}")(q)
            q = nn.leaky_relu(q, negative_slope=self.leaky_slope)
        bits = nn.Dense(1 + 2 * self.res_log2, dtype=jnp.float32,
                        name="query_out")(q.astype(jnp.float32))
        roi_logit = bits[..., 0:1]
        x_logits = bits[..., 1:1 + self.res_log2]
        y_logits = bits[..., 1 + self.res_log2:]
        return {
            "roi_logit": roi_logit,
            "x_logits": x_logits,
            "y_logits": y_logits,
            "seg_logits": seg_logits,
            "x_id": _hard_ids(x_logits),
            "y_id": _hard_ids(y_logits),
        }
