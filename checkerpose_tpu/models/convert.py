"""Torch -> Flax backbone weight conversion.

The reference initializes its backbones from timm ImageNet weights (or
ZebraPose-provided resnet checkpoints, `model/backbone.py:10-36`,
`README.md:52`). This module converts a torch state_dict (as saved by
timm/torchvision-style ResNet or timm HRNet) into this framework's Flax
parameter tree so pretrained-backbone training matches the reference recipe.

Only needs `torch` for deserialization; conversion itself is numpy. Gated:
environments without weight files simply train from scratch.

Layout rules:
  torch Conv2d weight (O, I, kH, kW)      -> flax Conv kernel (kH, kW, I, O)
  torch BatchNorm2d weight/bias           -> flax BatchNorm scale/bias
  torch BN running_mean/var               -> flax batch_stats mean/var
  torch Linear weight (O, I)              -> flax Dense kernel (I, O)
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if isinstance(sd, dict) and "model_state_dict" in sd:
        sd = sd["model_state_dict"]
    return {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}


def convert_resnet34(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """torchvision/timm ResNet-34 state_dict -> (params, batch_stats) matching
    models.resnet.ResNet34Features module names."""
    params: dict = {}
    stats: dict = {}

    def put_convbn(name, conv_key, bn_key):
        params[name] = {
            "conv": {"kernel": _conv(sd[conv_key + ".weight"])},
            "bn": {"scale": sd[bn_key + ".weight"], "bias": sd[bn_key + ".bias"]},
        }
        stats[name] = {"bn": {"mean": sd[bn_key + ".running_mean"],
                              "var": sd[bn_key + ".running_var"]}}

    put_convbn("stem", "conv1", "bn1")
    blocks_per = [3, 4, 6, 3]
    for s, nb in enumerate(blocks_per):
        for b in range(nb):
            pre = f"layer{s + 1}.{b}"
            name = f"layer{s + 1}_block{b}"
            sub_p, sub_s = {}, {}
            for i in (1, 2):
                kp = {"conv": {"kernel": _conv(sd[f"{pre}.conv{i}.weight"])},
                      "bn": {"scale": sd[f"{pre}.bn{i}.weight"],
                             "bias": sd[f"{pre}.bn{i}.bias"]}}
                ks = {"bn": {"mean": sd[f"{pre}.bn{i}.running_mean"],
                             "var": sd[f"{pre}.bn{i}.running_var"]}}
                sub_p[f"conv{i}"] = kp
                sub_s[f"conv{i}"] = ks
            if f"{pre}.downsample.0.weight" in sd:
                sub_p["downsample"] = {
                    "conv": {"kernel": _conv(sd[f"{pre}.downsample.0.weight"])},
                    "bn": {"scale": sd[f"{pre}.downsample.1.weight"],
                           "bias": sd[f"{pre}.downsample.1.bias"]}}
                sub_s["downsample"] = {
                    "bn": {"mean": sd[f"{pre}.downsample.1.running_mean"],
                           "var": sd[f"{pre}.downsample.1.running_var"]}}
            params[name] = sub_p
            stats[name] = sub_s
    return params, stats


def graft_backbone(pose_params: dict, pose_stats: dict, bk_params: dict,
                   bk_stats: dict, into: str = "init_net"):
    """Insert converted backbone weights under <into>/backbone. Returns new
    (params, batch_stats) dicts; shapes are validated leaf-by-leaf."""
    import jax

    tgt_p = dict(pose_params[into]["backbone"])
    tgt_s = dict(pose_stats[into]["backbone"])

    def check(a, b, path=""):
        for k, v in b.items():
            if k not in a:
                raise KeyError(f"converted key {path}/{k} missing in model")
            if isinstance(v, dict):
                check(a[k], v, path + "/" + k)
            elif tuple(np.shape(a[k])) != tuple(np.shape(v)):
                raise ValueError(f"shape mismatch at {path}/{k}: "
                                 f"{np.shape(a[k])} vs {np.shape(v)}")

    check(tgt_p, bk_params)
    check(tgt_s, bk_stats)

    def merge(dst, src):
        out = dict(dst)
        for k, v in src.items():
            out[k] = merge(dst[k], v) if isinstance(v, dict) else np.asarray(v)
        return out

    new_p = dict(pose_params)
    new_p[into] = dict(new_p[into])
    new_p[into]["backbone"] = merge(tgt_p, bk_params)
    new_s = dict(pose_stats)
    new_s[into] = dict(new_s[into])
    new_s[into]["backbone"] = merge(tgt_s, bk_stats)
    return new_p, new_s
