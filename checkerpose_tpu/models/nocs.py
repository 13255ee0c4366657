"""Dense NOCS pretraining head for backbone bootstrap.

The reference always starts from an ImageNet-pretrained backbone
(`model/backbone.py:39-50`, timm pretrained=True); no pretrained weights
exist in this offline image. This module is the in-framework substitute: a
dense normalized-object-coordinate (NOCS) regression task over the
synthetic renders teaches the backbone precise metric spatial features —
the exact capability the round-3 diagnosis found lacking (per-image scale/
offset binding, ACCURACY.md finding 5; fine bits need sub-4px features).

NOCSNet = backbone (registry, shared param layout: params["backbone"]) +
a small f32 conv head on the FINEST (stride-4) feature level predicting
4 channels: 3 NOCS coords in [0,1] + 1 visibility logit. After training,
`cli.pretrain --cfg <...>` grafts params["backbone"] into InitNet/PoseNet
via the same shape-validated path as the timm converter
(`models/convert.py::graft_backbone`).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from checkerpose_tpu.models.backbone import make_backbone


class NOCSNet(nn.Module):
    backbone_name: str = "hrnet_w18"
    head_width: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img: jnp.ndarray, train: bool = False):
        """img: (B, H, W, 3) normalized float.

        Returns (B, H/4, W/4, 4): channels 0-2 NOCS (sigmoid, [0,1]),
        channel 3 visibility LOGIT (caller applies BCE/sigmoid).
        """
        backbone = make_backbone(self.backbone_name, dtype=self.dtype)
        feats = backbone(img.astype(self.dtype), train)
        x = feats[0]  # finest level (stride 4)
        x = nn.Conv(self.head_width, (3, 3), dtype=self.dtype, name="head_conv0")(x)
        x = nn.leaky_relu(x, negative_slope=0.01)
        out = nn.Conv(4, (1, 1), dtype=jnp.float32, name="head_out")(
            x.astype(jnp.float32))
        nocs = nn.sigmoid(out[..., :3])
        return jnp.concatenate([nocs, out[..., 3:4]], axis=-1)
