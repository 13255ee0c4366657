"""ConvNeXt feature backbone (NHWC).

Matches the reference's timm `features_only` extraction with out_indices
(1,2,3) (`model/backbone.py:40-41`): three maps at strides 8/16/32 with
channels [192,384,768] (tiny/small) or [256,512,1024] (base)
(`model/pipeline.py:8-10`). ConvNeXt (Liu et al. 2022): patchify stem,
depthwise 7x7 + pointwise MLP blocks, LayerNorm, layer scale.
"""
from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.dim, (7, 7), feature_group_count=self.dim,
                    dtype=self.dtype, name="dwconv")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="pwconv1")(y.astype(self.dtype))
        y = nn.gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(y)
        gamma = self.param("gamma", nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return x + y * gamma.astype(y.dtype)


_CONVNEXT_CFGS = {
    "convnext_tiny": ((96, 192, 384, 768), (3, 3, 9, 3)),
    "convnext_small": ((96, 192, 384, 768), (3, 3, 27, 3)),
    "convnext_base": ((128, 256, 512, 1024), (3, 3, 27, 3)),
}


class ConvNeXtFeatures(nn.Module):
    name_cfg: str = "convnext_tiny"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        dims, depths = _CONVNEXT_CFGS[self.name_cfg]
        x = x.astype(self.dtype)
        feats = []
        for s in range(4):
            if s == 0:
                x = nn.Conv(dims[0], (4, 4), strides=(4, 4), dtype=self.dtype,
                            name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name="stem_norm")(x).astype(self.dtype)
            else:
                x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                                 name=f"down{s}_norm")(x).astype(self.dtype)
                x = nn.Conv(dims[s], (2, 2), strides=(2, 2), dtype=self.dtype,
                            name=f"down{s}_conv")(x)
            for b in range(depths[s]):
                x = ConvNeXtBlock(dims[s], dtype=self.dtype,
                                  name=f"stage{s}_block{b}")(x)
            feats.append(x)
        # out_indices (1,2,3): strides 8/16/32 (the stride-4 map is unused,
        # same as the reference's timm extraction)
        return feats[1:]
