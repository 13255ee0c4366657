"""HRNet feature backbone (NHWC) — the reference's headline backbone.

Re-implements the HRNet-v2 architecture (Wang et al., TPAMI 2020) natively in
Flax. Output pyramid matches the reference's timm `features_only` extraction
with out_indices (1,2,3,4) (reference `model/backbone.py:42-44`): four maps at
strides 4/8/16/32 with channels 128/256/512/1024 via per-branch incre heads
(`model/pipeline.py:12` IMG_FEATS_DIMS["hrnet_w18"]).

Widths: w18 -> (18, 36, 72, 144); w30 -> (30, 60, 120, 240);
w18_small(_v2) -> (18, 36, 72, 144) with shallower stages.
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
import flax.linen as nn

from checkerpose_tpu.models.layers import BasicBlock, Bottleneck, ConvBNAct


def _upsample_nearest(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (B, H, factor, W, factor, C))
    return x.reshape(B, H * factor, W * factor, C)


class FuseLayer(nn.Module):
    """Cross-resolution fusion: every output branch receives every input
    branch (1x1+nearest-up for coarser inputs, strided 3x3 chain for finer
    inputs), summed then ReLU'd."""
    widths: Sequence[int]
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool):
        n = len(self.widths)
        outs = []
        for i in range(n):
            acc = None
            for j in range(n):
                if j == i:
                    y = xs[j]
                elif j > i:  # coarser -> up
                    y = ConvBNAct(self.widths[i], 1, 1, None, dtype=self.dtype,
                                  name=f"up_{j}_to_{i}")(xs[j], train)
                    y = _upsample_nearest(y, 2 ** (j - i))
                else:  # finer -> down via (i-j) stride-2 3x3 convs
                    y = xs[j]
                    for s in range(i - j):
                        last = s == i - j - 1
                        y = ConvBNAct(self.widths[i] if last else self.widths[j], 3, 2,
                                      None if last else nn.relu, dtype=self.dtype,
                                      name=f"down_{j}_to_{i}_{s}")(y, train)
                acc = y if acc is None else acc + y
            outs.append(nn.relu(acc))
        return outs


class HRModule(nn.Module):
    """num_blocks BasicBlocks per branch, then fuse."""
    widths: Sequence[int]
    num_blocks: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, xs, train: bool):
        ys = []
        for b, x in enumerate(xs):
            for k in range(self.num_blocks):
                x = BasicBlock(self.widths[b], 1, dtype=self.dtype,
                               name=f"branch{b}_block{k}")(x, train)
            ys.append(x)
        return FuseLayer(self.widths, dtype=self.dtype, name="fuse")(ys, train)


_HRNET_CFGS = {
    # name: (widths, stage_modules (s2, s3, s4), blocks_per_module)
    "hrnet_w18": ((18, 36, 72, 144), (1, 4, 3), 4),
    "hrnet_w30": ((30, 60, 120, 240), (1, 4, 3), 4),
    "hrnet_w18_small": ((18, 36, 72, 144), (1, 1, 1), 2),
}


class HRNetFeatures(nn.Module):
    name_cfg: str = "hrnet_w18"
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        widths, stage_modules, blocks = _HRNET_CFGS[self.name_cfg]

        # stem (stride 4)
        x = ConvBNAct(64, 3, 2, nn.relu, dtype=self.dtype, name="stem1")(x, train)
        x = ConvBNAct(64, 3, 2, nn.relu, dtype=self.dtype, name="stem2")(x, train)

        # layer1: bottlenecks at stride 4 -> 256 channels
        n_l1 = 4 if blocks == 4 else 2
        for k in range(n_l1):
            x = Bottleneck(64, 1, dtype=self.dtype, name=f"layer1_block{k}")(x, train)

        # progressively add branches; stage s has s+2 branches
        xs = [x]
        for stage in range(3):  # stages 2, 3, 4
            n_br = stage + 2
            ws = widths[:n_br]
            # transition: adapt each existing branch if width differs, create
            # the new branch from the finest-available via stride-2 conv
            new_xs = []
            for b in range(n_br - 1):
                c_in = xs[b].shape[-1]
                if c_in != ws[b]:
                    y = ConvBNAct(ws[b], 3, 1, nn.relu, dtype=self.dtype,
                                  name=f"t{stage}_adapt{b}")(xs[b], train)
                else:
                    y = xs[b]
                new_xs.append(y)
            y = ConvBNAct(ws[-1], 3, 2, nn.relu, dtype=self.dtype,
                          name=f"t{stage}_new")(xs[-1], train)
            new_xs.append(y)
            xs = new_xs
            for m in range(stage_modules[stage]):
                xs = HRModule(ws, blocks, dtype=self.dtype,
                              name=f"stage{stage + 2}_module{m}")(xs, train)

        # incre heads: bottleneck widening each branch to 128/256/512/1024
        feats = []
        for b, x in enumerate(xs):
            head = Bottleneck(32 * (2 ** b), 1, dtype=self.dtype, name=f"incre{b}")(x, train)
            feats.append(head)
        return feats  # strides 4, 8, 16, 32; channels 128, 256, 512, 1024
