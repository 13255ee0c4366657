"""DarkNet-53 feature backbone (NHWC).

Matches the reference's timm `features_only` extraction with out_indices
(1..5) (`model/backbone.py:44-45`): five maps at strides 2/4/8/16/32 with
channels [64,128,256,512,1024] (`model/pipeline.py:11`). DarkNet-53
(YOLOv3): leaky-ReLU conv-BN blocks with 1x1/3x3 residual pairs.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from checkerpose_tpu.models.layers import ConvBNAct


def _lrelu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


class DarkBlock(nn.Module):
    features: int  # output channels (block squeezes to features//2 then back)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        y = ConvBNAct(self.features // 2, 1, 1, _lrelu, dtype=self.dtype,
                      name="conv1")(x, train)
        y = ConvBNAct(self.features, 3, 1, _lrelu, dtype=self.dtype,
                      name="conv2")(y, train)
        return x + y


class DarkNet53Features(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(32, 3, 1, _lrelu, dtype=self.dtype, name="stem")(x.astype(self.dtype), train)
        feats = []
        stage_defs = [(64, 1), (128, 2), (256, 8), (512, 8), (1024, 4)]
        for s, (width, nblocks) in enumerate(stage_defs):
            x = ConvBNAct(width, 3, 2, _lrelu, dtype=self.dtype,
                          name=f"down{s}")(x, train)
            for b in range(nblocks):
                x = DarkBlock(width, dtype=self.dtype, name=f"stage{s}_block{b}")(x, train)
            feats.append(x)
        return feats  # strides 2, 4, 8, 16, 32
