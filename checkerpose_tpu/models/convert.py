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


def _convbn(sd: Dict[str, np.ndarray], conv_key: str, bn_key: str):
    """(params, stats) subtree for one ConvBNAct module."""
    p = {"conv": {"kernel": _conv(sd[conv_key + ".weight"])},
         "bn": {"scale": sd[bn_key + ".weight"], "bias": sd[bn_key + ".bias"]}}
    s = {"bn": {"mean": sd[bn_key + ".running_mean"],
                "var": sd[bn_key + ".running_var"]}}
    return p, s


def _bottleneck(sd: Dict[str, np.ndarray], pre: str):
    """timm Bottleneck `{pre}.conv1/bn1..conv3/bn3[.downsample]` ->
    models.layers.Bottleneck subtree (conv1..conv3, downsample)."""
    p, s = {}, {}
    for i in (1, 2, 3):
        p[f"conv{i}"], s[f"conv{i}"] = _convbn(sd, f"{pre}.conv{i}", f"{pre}.bn{i}")
    if f"{pre}.downsample.0.weight" in sd:
        p["downsample"], s["downsample"] = _convbn(
            sd, f"{pre}.downsample.0", f"{pre}.downsample.1")
    return p, s


def _basicblock(sd: Dict[str, np.ndarray], pre: str):
    p, s = {}, {}
    for i in (1, 2):
        p[f"conv{i}"], s[f"conv{i}"] = _convbn(sd, f"{pre}.conv{i}", f"{pre}.bn{i}")
    if f"{pre}.downsample.0.weight" in sd:
        p["downsample"], s["downsample"] = _convbn(
            sd, f"{pre}.downsample.0", f"{pre}.downsample.1")
    return p, s


def convert_hrnet_w18(sd: Dict[str, np.ndarray]) -> Tuple[dict, dict]:
    """timm `hrnet_w18` state_dict -> (params, batch_stats) matching
    models.hrnet.HRNetFeatures module names.

    The reference loads this backbone ImageNet-pretrained via timm
    (`model/backbone.py:39-50`, `README.md:52`). timm layout (HighResolutionNet):
      conv1/bn1, conv2/bn2                       stem, two stride-2 3x3s
      layer1.{k}                                 4 Bottlenecks (64 -> 256)
      transition{s}.{b}[.0].{0,1}                adapt convs / new-branch conv
      stage{s}.{m}.branches.{b}.{k}              4 BasicBlocks per branch
      stage{s}.{m}.fuse_layers.{i}.{j}[...]      1x1+up (j>i) / 3x3-s2 chain (j<i)
      incre_modules.{b}.0                        Bottleneck widening heads
    Classification-only tensors (downsamp_modules, final_layer, classifier)
    are ignored.
    """
    params: dict = {}
    stats: dict = {}

    def put(name, p, s):
        params[name] = p
        stats[name] = s

    put("stem1", *_convbn(sd, "conv1", "bn1"))
    put("stem2", *_convbn(sd, "conv2", "bn2"))
    for k in range(4):
        put(f"layer1_block{k}", *_bottleneck(sd, f"layer1.{k}"))

    stage_modules = (1, 4, 3)  # timm hrnet_w18 stages 2/3/4
    for stage in range(3):
        n_br = stage + 2
        # transitions: adapt convs exist only where widths change (stage 2
        # branch adapts from the 256-ch layer1 output); the new branch is a
        # nested Sequential -> extra ".0"
        for b in range(n_br - 1):
            key = f"transition{stage + 1}.{b}.0.weight"
            if key in sd:
                put(f"t{stage}_adapt{b}", *_convbn(
                    sd, f"transition{stage + 1}.{b}.0", f"transition{stage + 1}.{b}.1"))
        put(f"t{stage}_new", *_convbn(
            sd, f"transition{stage + 1}.{n_br - 1}.0.0",
            f"transition{stage + 1}.{n_br - 1}.0.1"))

        for m in range(stage_modules[stage]):
            tpre = f"stage{stage + 2}.{m}"
            mod_p, mod_s = {}, {}
            for b in range(n_br):
                for k in range(4):
                    p, s = _basicblock(sd, f"{tpre}.branches.{b}.{k}")
                    mod_p[f"branch{b}_block{k}"] = p
                    mod_s[f"branch{b}_block{k}"] = s
            fuse_p, fuse_s = {}, {}
            for i in range(n_br):
                for j in range(n_br):
                    if j > i:
                        p, s = _convbn(sd, f"{tpre}.fuse_layers.{i}.{j}.0",
                                       f"{tpre}.fuse_layers.{i}.{j}.1")
                        fuse_p[f"up_{j}_to_{i}"] = p
                        fuse_s[f"up_{j}_to_{i}"] = s
                    elif j < i:
                        for step in range(i - j):
                            p, s = _convbn(
                                sd, f"{tpre}.fuse_layers.{i}.{j}.{step}.0",
                                f"{tpre}.fuse_layers.{i}.{j}.{step}.1")
                            fuse_p[f"down_{j}_to_{i}_{step}"] = p
                            fuse_s[f"down_{j}_to_{i}_{step}"] = s
            mod_p["fuse"] = fuse_p
            mod_s["fuse"] = fuse_s
            put(f"stage{stage + 2}_module{m}", mod_p, mod_s)

    for b in range(4):
        put(f"incre{b}", *_bottleneck(sd, f"incre_modules.{b}.0"))
    return params, stats


CONVERTERS = {"resnet34": convert_resnet34, "hrnet_w18": convert_hrnet_w18}


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
