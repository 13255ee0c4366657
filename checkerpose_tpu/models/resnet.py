"""ResNet-34 feature backbone (NHWC, multi-scale outputs).

Feature pyramid matches the reference's timm `features_only` extraction with
out_indices (1,2,3,4) (reference `model/backbone.py:39-50`): four maps at
strides 4/8/16/32 with channels 64/128/256/512
(`model/pipeline.py:6-15` IMG_FEATS_DIMS["resnet34"]).
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

from checkerpose_tpu.models.layers import BasicBlock, ConvBNAct


class ResNet34Features(nn.Module):
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        # stem: 7x7/2 conv + 3x3/2 maxpool
        x = ConvBNAct(64, 7, 2, nn.relu, dtype=self.dtype, name="stem")(x, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        stage_defs = [(64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)]
        for s, (width, blocks, stride) in enumerate(stage_defs):
            for b in range(blocks):
                x = BasicBlock(width, stride if b == 0 else 1, dtype=self.dtype,
                               name=f"layer{s + 1}_block{b}")(x, train)
            feats.append(x)
        return feats  # strides 4, 8, 16, 32
