"""Full progressive pose network.

TPU-native redesign of the reference `PoseNet_GNNskip`
(`model/pipeline.py:301-384`): the init net produces coarse 8x8 codes; each
refinement step doubles resolution (8->16->32->64), gathers per-keypoint local
features at the current integer locations, runs an EdgeConv stack, and emits
one new x bit and one new y bit per keypoint. Location updates are hard and
non-differentiable (stop_gradient), exactly mirroring the reference's
`.detach()` placement (`model/pipeline.py:367-381`) -- SURVEY hard part 3.

The progressive `stage` is a static Python int, so each curriculum stage is
its own compiled program (<= num_refine_steps + 1 variants).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from checkerpose_tpu.models.graph import EdgeConv
from checkerpose_tpu.models.init_net import InitNet
from checkerpose_tpu.models.layers import upsample_bilinear_2x


def _hard_bit(logits: jnp.ndarray) -> jnp.ndarray:
    """Detached logits -> int {0,1}. sigmoid(x) > 0.5 <=> x > 0."""
    return (jax.lax.stop_gradient(logits) > 0.0).astype(jnp.int32)


def _hard_ids(logits: jnp.ndarray) -> jnp.ndarray:
    """Detached MSB-first bit logits (B, N, L) -> integer ids (B, N)."""
    bits = _hard_bit(logits)
    L = bits.shape[-1]
    w = (1 << (L - 1 - jnp.arange(L, dtype=jnp.int32)))
    return jnp.sum(bits * w, axis=-1)


class UpBlock(nn.Module):
    """GDR-Net-style 2x upsampler (reference `model/pipeline.py:183-211`):
    first step ConvTranspose, later steps bilinear-up + conv; both followed by
    two conv3x3+BN+ReLU."""
    num_filters: int = 256
    is_convtrans: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(y, name):
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                             dtype=jnp.float32, name=name)(y)
            return nn.relu(y.astype(self.dtype))

        if self.is_convtrans:
            x = nn.ConvTranspose(self.num_filters, (3, 3), strides=(2, 2),
                                 use_bias=False, dtype=self.dtype, name="convT")(x)
            x = bn(x, "bn0")
            x = nn.Conv(self.num_filters, (3, 3), use_bias=False, dtype=self.dtype,
                        name="conv1")(x)
        else:
            x = upsample_bilinear_2x(x)
            x = nn.Conv(self.num_filters, (3, 3), use_bias=False, dtype=self.dtype,
                        name="conv1")(x)
        x = bn(x, "bn1")
        x = nn.Conv(self.num_filters, (3, 3), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        x = bn(x, "bn2")
        return x


class Index2Feat(nn.Module):
    """Patch-embed conv + gather at the 4 children of each keypoint location.

    Reference `Index2Feat_module` (`model/pipeline.py:130-164`): conv with
    kernel k, padding k-1 (both sides), then read the embeddings at
    (2u, 2v), (2u+k, 2v), (2u, 2v+k), (2u+k, 2v+k) and concat -> (B, N, 4E).
    """
    embed_dim: int
    kernel_size: int = 2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img_feat, x_id, y_id):
        k = self.kernel_size
        p = ((k - 1, k - 1), (k - 1, k - 1))
        patches = nn.Conv(self.embed_dim, (k, k), padding=p, dtype=self.dtype,
                          name="patch_conv")(img_feat)          # (B, H', W', E)
        B, Hp, Wp, E = patches.shape
        flat = patches.reshape(B, Hp * Wp, E)

        import os
        if os.environ.get("CHECKERPOSE_I2F_FUSED_GATHER", "1") == "1":
            # one gather of all 4 child positions instead of 4 separate
            # gathers; identical values, same (B, N, 4E) concat order
            base_y = 2 * y_id
            base_x = 2 * x_id
            lin = jnp.stack([
                base_y * Wp + base_x,
                (base_y + k) * Wp + base_x,
                base_y * Wp + (base_x + k),
                (base_y + k) * Wp + (base_x + k),
            ], axis=1)                                          # (B, 4, N)
            g = jnp.take_along_axis(
                flat, lin.reshape(B, -1)[..., None], axis=1)    # (B, 4N, E)
            g = g.reshape(B, 4, -1, E)
            return g.transpose(0, 2, 1, 3).reshape(B, g.shape[2], 4 * E)

        def read(dy, dx):
            lin = (2 * y_id + dy) * Wp + (2 * x_id + dx)        # (B, N)
            return jnp.take_along_axis(flat, lin[..., None], axis=1)  # (B, N, E)

        sf = [read(0, 0), read(k, 0), read(0, k), read(k, k)]
        return jnp.concatenate(sf, axis=-1)                     # (B, N, 4E)


class RefineBlock(nn.Module):
    """One progressive refinement step (reference `Refine_moduleGNN`,
    `model/pipeline.py:214-298`)."""
    num_filters: int = 256
    query_dims: Tuple[int, ...] = (256, 256, 64)
    local_k: int = 2
    leaky_slope: float = 0.01
    num_graph_module: int = 2
    graph_leaky_slope: float = 0.2
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, img_feat, graph_feat, p3d_normed, roi_mask, x_id, y_id,
                 knn_idx, train: bool):
        C0 = self.query_dims[0]
        local = Index2Feat(embed_dim=C0 // 4, kernel_size=self.local_k,
                           dtype=self.dtype, name="index2feat")(img_feat, x_id, y_id)
        # zero out-of-RoI keypoints (mask already detached by caller)
        local = local * roi_mask.astype(local.dtype)

        x = jnp.concatenate([local, graph_feat.astype(local.dtype)], axis=-1)
        # pre_graph MLP: 2 Dense with LeakyReLU incl. after last (doLastAct)
        x = nn.Dense(C0, dtype=self.dtype, name="pre_graph_0")(x)
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)
        x = nn.Dense(C0, dtype=self.dtype, name="pre_graph_1")(x)
        x = nn.leaky_relu(x, negative_slope=self.leaky_slope)

        for i in range(self.num_graph_module):
            x = EdgeConv(C0, self.graph_leaky_slope, dtype=self.dtype,
                         name=f"graph_{i}")(x, knn_idx, train)

        # query MLP (reference MLP_QueryNet ignores the 3D points,
        # `model/pipeline.py:174-180`): dims query_dims + (2,)
        q = x
        for i, d in enumerate(self.query_dims[1:]):
            q = nn.Dense(d, dtype=self.dtype, name=f"query_{i}")(q)
            q = nn.leaky_relu(q, negative_slope=self.leaky_slope)
        new_bits = nn.Dense(2, dtype=jnp.float32,
                            name="query_out")(q.astype(jnp.float32))  # (B, N, 2)
        return new_bits, x


class PoseNet(nn.Module):
    """Progressive binary-code pose network (init + refinement + seg head)."""
    npoint: int
    res_log2: int = 6
    backbone_name: str = "resnet34"
    num_filters: int = 256
    query_dims: Tuple[int, ...] = (256, 256, 64)
    seg_output_dim: int = 2
    local_k: int = 2
    leaky_slope: float = 0.01
    num_graph_module: int = 2
    graph_leaky_slope: float = 0.2
    init_num_conv1x1: int = 1
    init_num_graph_module: int = 2
    init_graph_leaky_slope: float = 0.2
    # Opt-in dense per-keypoint heatmap heads on each UpBlock output (one
    # conv1x1 -> npoint channels per refine stage), sown as intermediates for
    # the auxiliary refine heatmap loss (train/steps.py::_aux_refine_loss).
    # OFF in all reference-parity configs: the reference fine-tunes an
    # ImageNet-pretrained backbone and needs no bootstrap; from scratch the
    # refine bits measurably stall at chance without dense supervision
    # (ACCURACY.md: bits 3-5 ended at 0.24/0.46/0.50 error in a 47k-step run).
    aux_refine_heads: bool = False
    dtype: Any = jnp.bfloat16

    @property
    def num_refine_steps(self) -> int:
        return self.res_log2 - 3

    def output_res_log2(self, stage: Optional[int]) -> int:
        """Resolution of the emitted x_id/y_id: 8 doubled once per active
        refinement stage."""
        return 3 + (self.num_refine_steps if stage is None else stage)

    @nn.compact
    def __call__(self, img, knn_idx, p3d_normed=None, stage: Optional[int] = None,
                 train: bool = False, tf_gather=None):
        """Returns dict with:
          roi_logit (B, N, 1), x_logits (B, N, res_log2), y_logits likewise
          (first 3 bits from init net, later bits appended per active stage),
          seg_logits (B, h, w, seg_output_dim), x_id/y_id (B, N) final integer
          locations at resolution 2**(3 + stage).

        tf_gather (train-only, opt-in): teacher-forced refine conditioning —
        a tuple (gt_x_id, gt_y_id, gt_roi, sel) with gt ids (B, N) int32 at
        2**res_log2 resolution, gt_roi (B, N, 1) f32, sel (B, N) bool. For
        selected keypoints every refine gather reads the GT cell (its MSB
        prefix at that stage's resolution) instead of the predicted one, so
        the refine bits train on a well-posed task ("which half of the TRUE
        cell holds the keypoint") from step 0 instead of on noise whenever
        the coarse prediction is wrong. The running predicted ids and the
        loss labels are unchanged; the reference has no analog because its
        pretrained backbone makes coarse bits accurate early (see
        ACCURACY.md). Ignored at inference.
        """
        num_active = self.num_refine_steps if stage is None else stage
        # stage >= 1: the seg head consumes the 256-filter upsampled map, so at
        # least one UpBlock must run (the reference has the same constraint
        # implicitly -- its seg conv expects num_filters channels and its
        # shipped configs always activate stage>=1 from step 0).
        assert 1 <= num_active <= self.num_refine_steps

        init = InitNet(npoint=self.npoint, res_log2=3, backbone_name=self.backbone_name,
                       num_conv1x1=self.init_num_conv1x1,
                       num_graph_module=self.init_num_graph_module,
                       graph_leaky_slope=self.init_graph_leaky_slope,
                       dtype=self.dtype, name="init_net")
        bits, feats, graph_feat = init(img, knn_idx, train)

        # refine gathers index an 8->16->32->64 grid pyramid built by
        # doubling the init net's LAST map, so that map must be 8x8 (crop
        # 256 at backbone stride 32). A smaller crop makes the predicted
        # cell ids index past the upsampled maps, which jnp gathers fill
        # with NaN — fail loudly at trace time instead.
        if feats[-1].shape[1:3] != (8, 8):
            raise ValueError(
                f"PoseNet refine stages require an 8x8 init feature map "
                f"(crop 256 at stride 32), got {feats[-1].shape[1:3]}. "
                f"Use BoundingBox_CropSize_image = 256.")

        roi_logit = bits[..., 0:1]
        x_logits = bits[..., 1:4]
        y_logits = bits[..., 4:7]

        roi_mask = (jax.lax.stop_gradient(roi_logit) > 0.0).astype(jnp.float32)
        x_id = _hard_ids(x_logits)
        y_id = _hard_ids(y_logits)

        use_tf = train and tf_gather is not None
        if use_tf:
            gt_x_full, gt_y_full, gt_roi, tf_sel = tf_gather

        img_feat = feats[-1]
        for i in range(num_active):
            if i > 0:
                img_feat = jnp.concatenate(
                    [img_feat, feats[-i - 1].astype(img_feat.dtype)], axis=-1)
            img_feat = UpBlock(self.num_filters, is_convtrans=(i == 0),
                               dtype=self.dtype, name=f"up_{i}")(img_feat, train)
            if self.aux_refine_heads and train:
                # dense per-keypoint response map at this refine resolution;
                # channel -> (B, N, H*W) like InitNet's resp_map
                r = nn.Conv(self.npoint, (1, 1), dtype=self.dtype,
                            name=f"aux_resp_{i}")(img_feat)
                B_, H_, W_, N_ = r.shape
                self.sow("intermediates", f"refine_resp_{i}",
                         r.transpose(0, 3, 1, 2).reshape(B_, N_, H_ * W_))
            if use_tf:
                shift = self.res_log2 - (3 + i)
                g_x = jnp.where(tf_sel, gt_x_full >> shift, x_id)
                g_y = jnp.where(tf_sel, gt_y_full >> shift, y_id)
                g_roi = jnp.where(tf_sel[..., None], gt_roi, roi_mask)
            else:
                g_x, g_y, g_roi = x_id, y_id, roi_mask
            new_bits, graph_feat = RefineBlock(
                num_filters=self.num_filters, query_dims=self.query_dims,
                local_k=self.local_k, leaky_slope=self.leaky_slope,
                num_graph_module=self.num_graph_module,
                graph_leaky_slope=self.graph_leaky_slope, dtype=self.dtype,
                name=f"refine_{i}")(img_feat, graph_feat, p3d_normed, g_roi,
                                    g_x, g_y, knn_idx, train)
            x_logits = jnp.concatenate([x_logits, new_bits[..., 0:1]], axis=-1)
            y_logits = jnp.concatenate([y_logits, new_bits[..., 1:2]], axis=-1)
            x_id = x_id * 2 + _hard_bit(new_bits[..., 0])
            y_id = y_id * 2 + _hard_bit(new_bits[..., 1])

        seg_logits = nn.Conv(self.seg_output_dim, (1, 1), dtype=jnp.float32,
                             name="seg_block")(img_feat.astype(jnp.float32))
        return {
            "roi_logit": roi_logit,
            "x_logits": x_logits,
            "y_logits": y_logits,
            "seg_logits": seg_logits,
            "x_id": x_id,
            "y_id": y_id,
        }
