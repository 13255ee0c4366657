"""Backbone registry.

Mirrors the reference's supported set and channel tables
(`model/backbone.py:39-50`, `model/init.py:15-24`, `model/pipeline.py:6-15`).
"""
from __future__ import annotations

import jax.numpy as jnp

from checkerpose_tpu.models.resnet import ResNet34Features
from checkerpose_tpu.models.hrnet import HRNetFeatures
from checkerpose_tpu.models.convnext import ConvNeXtFeatures
from checkerpose_tpu.models.darknet import DarkNet53Features

# channels of the multi-scale feature pyramid, coarse last (reference
# IMG_FEATS_DIMS, model/pipeline.py:6-15)
BACKBONE_FEAT_DIMS = {
    "resnet34": [64, 128, 256, 512],
    "hrnet_w18": [128, 256, 512, 1024],
    "hrnet_w18_small": [128, 256, 512, 1024],
    "hrnet_w30": [128, 256, 512, 1024],
    "convnext_tiny": [192, 384, 768],
    "convnext_small": [192, 384, 768],
    "convnext_base": [256, 512, 1024],
    "darknet53": [64, 128, 256, 512, 1024],
}

# channels of the last (stride-32) map, input to the keypoint conv1x1
CONV1X1_IN_CHANS = {k: v[-1] for k, v in BACKBONE_FEAT_DIMS.items()}


def make_backbone(name: str, dtype=jnp.bfloat16):
    if name == "resnet34":
        return ResNet34Features(dtype=dtype, name="backbone")
    if name in ("hrnet_w18", "hrnet_w18_small", "hrnet_w30"):
        return HRNetFeatures(name_cfg=name, dtype=dtype, name="backbone")
    if name in ("convnext_tiny", "convnext_small", "convnext_base"):
        return ConvNeXtFeatures(name_cfg=name, dtype=dtype, name="backbone")
    if name == "darknet53":
        return DarkNet53Features(dtype=dtype, name="backbone")
    raise ValueError(f"backbone {name} not supported")
