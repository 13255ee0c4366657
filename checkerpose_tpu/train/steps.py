"""Jitted training / eval steps.

Everything per-sample-expensive lives inside these jitted global-view
functions: color augmentation, ImageNet normalization, GT binary-code label
generation, forward, losses, grads, optimizer update. The host only decodes
and crops images (data/dataset.py). Under a sharded mesh the same code is the
multi-chip data-parallel program -- XLA inserts the gradient/BN all-reduces.

Loss structure mirrors the reference:
  * pretrain (`pretrain.py:261-268`): unmasked BCE on the RoI bit + masked
    BCE on the first res_log2 x/y bits.
  * train (`train.py:310-318`): RoI + masked x/y over 3+stage bits + weighted
    visib/full seg mask L1.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax

from checkerpose_tpu.losses import (masked_code_loss, unmasked_code_loss,
                                    mask_loss_interpolate,
                                    per_bit_masked_code_loss)
from checkerpose_tpu.ops import augment, codes, crop, geometry


def teacher_force_prob_at(step: int, base: float, anneal_start: int,
                          anneal_end: int) -> float:
    """Scheduled-sampling anneal for the teacher-forced refine conditioning.

    Teacher forcing (tf_gather in models/posenet.py) makes the fine-bit task
    well-posed from step 0, but inference always conditions on the PREDICTED
    prefix cell, so a constant probability leaves a train/eval distribution
    gap on the refine inputs. Linear decay from `base` (steps <= anneal_start)
    to 0 (steps >= anneal_end) closes the gap before the low-lr fine-tune
    phase. The probability is static under jit; the segmented-restart drivers
    (tools/run_synth_proof*.sh) re-build the step fns every ~1200 steps, so a
    per-segment constant evaluated at the segment's resume step approximates
    the schedule piecewise. anneal_end <= anneal_start disables the anneal."""
    if base <= 0.0 or anneal_end <= anneal_start:
        return base
    frac = (step - anneal_start) / float(anneal_end - anneal_start)
    return base * min(1.0, max(0.0, 1.0 - frac))


def finebit_bit_weights(cfg, step: int, active_bits: int):
    """Resolve the fine-bit loss-boost cfg keys to a per-bit weight tuple
    (or None = parity) at segment-resume `step`.

    Keys (all opt-in; absent = reference parity):
      * finebit_loss_boost_weight: weight applied to bits >= start_bit
        (coarser bits keep 1.0 — pure amplification, no re-normalization).
      * finebit_boost_start_bit (default 4): first boosted bit index
        (0-based MSB-first; 4 = the two finest of res_log2=6).
      * finebit_boost_start_step (default = refine_teacher_force_anneal_end):
        boost activates on the autonomous tail only. Piecewise per segment
        restart, like the TF anneal.
    """
    boost = float(cfg.get("finebit_loss_boost_weight", 0.0) or 0.0)
    start_bit = int(cfg.get("finebit_boost_start_bit", 4))
    start_step = int(cfg.get("finebit_boost_start_step",
                             cfg.get("refine_teacher_force_anneal_end", 0)))
    if boost <= 0.0 or step < start_step or active_bits <= start_bit:
        return None
    return tuple(1.0 if j < start_bit else boost for j in range(active_bits))


def nocs_labels(depth, mask_visib, bbox, cam_K, R, t, diameter: float):
    """Per-pixel NOCS targets from a depth crop, fully on device.

    depth: (B, S, S) float mm at the GT-crop grid (nearest-resized);
    mask_visib: (B, S, S) {0,1}; bbox (B, 4) final square crop; cam_K
    (B, 3, 3); R (B, 3, 3); t (B, 3); diameter: object diameter mm
    (static). Returns (nocs (B, S, S, 3) in [0,1], valid (B, S, S) f32).

    Backprojection at CELL CENTERS of the crop grid mapped to original
    pixels (ops/geometry.py::map_crop_to_original semantics + 0.5):
    P_cam = K^-1 [u, v, 1] z; model coords m = R^T (P_cam - t);
    nocs = m / diameter + 0.5 (an object fits a diameter-side cube).
    """
    B, S = depth.shape[0], depth.shape[1]
    g = jnp.arange(S, dtype=jnp.float32) + 0.5              # cell centers

    def one(z, mv, bb, K, Rm, tv):
        u = bb[2] / S * g + bb[0]                           # (S,) x coords
        v = bb[3] / S * g + bb[1]                           # (S,) y coords
        uu = jnp.broadcast_to(u[None, :], (S, S))
        vv = jnp.broadcast_to(v[:, None], (S, S))
        X = (uu - K[0, 2]) * z / K[0, 0]
        Y = (vv - K[1, 2]) * z / K[1, 1]
        P = jnp.stack([X, Y, z], axis=-1)                   # (S, S, 3) cam mm
        m = jnp.einsum("ij,hwj->hwi", Rm.T, P - tv[None, None, :])
        nocs = m / diameter + 0.5
        valid = ((z > 0) & (mv > 0.5)).astype(jnp.float32)
        return jnp.clip(nocs, 0.0, 1.0), valid

    return jax.vmap(one)(depth, mask_visib, bbox, cam_K, R, t)


def make_nocs_train_step(net, optimizer: optax.GradientTransformation, *,
                         diameter: float, use_pepper_salt=True,
                         use_motion_blur=True, color_aug_prob=0.8,
                         visib_loss_weight: float = 0.5, mesh=None):
    """Dense NOCS pretraining step (backbone bootstrap, models/nocs.py).

    Loss = masked L1 on the 3 NOCS channels + BCE on the visibility
    channel (full grid). Same color augmentation bank as the pose steps.

    mesh: optional (verts, faces) static constants — when given, the GT
    depth crop is RENDERED ON DEVICE inside the jitted step
    (ops/raster.py) at the sample's crop grid; otherwise batch["depth"]
    must carry a host-rendered crop. On-device is the production path:
    host rendering costs ~21 ms/item on this 1-core machine (1.4 s per
    batch-64 step) vs microseconds on the VPU.
    """
    if mesh is not None:
        from checkerpose_tpu.ops.raster import render_depth_crops
        mesh_verts, mesh_faces = mesh

    @jax.jit
    def step(state: Dict[str, Any], batch, key):
        imgs = device_augment_normalize(batch["image"], key, use_pepper_salt,
                                        use_motion_blur, train=True,
                                        color_aug_prob=color_aug_prob)
        if mesh is not None:
            S = batch["mask_visib"].shape[1]
            depth = render_depth_crops(mesh_verts, mesh_faces, batch["R"],
                                       batch["t"], batch["cam_K"],
                                       batch["bbox"], S)
        else:
            depth = batch["depth"]
        gt_nocs, valid = nocs_labels(depth, batch["mask_visib"],
                                     batch["bbox"], batch["cam_K"],
                                     batch["R"], batch["t"], diameter)

        def loss_fn(params):
            out, updates = net.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                imgs, train=True, mutable=["batch_stats"])
            n = jnp.maximum(jnp.sum(valid), 1.0)
            l_nocs = jnp.sum(jnp.abs(out[..., :3] - gt_nocs)
                             * valid[..., None]) / (3.0 * n)
            logit = out[..., 3]
            mv = batch["mask_visib"]
            l_vis = jnp.mean(optax.sigmoid_binary_cross_entropy(logit, mv))
            total = l_nocs + visib_loss_weight * l_vis
            metrics = {"loss": total, "loss_nocs": l_nocs, "loss_visib": l_vis}
            return total, (updates["batch_stats"], metrics)

        (_, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, new_opt = optimizer.update(grads, state["opt_state"],
                                            state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return {"params": new_params, "batch_stats": new_bs,
                "opt_state": new_opt}, metrics

    return step


def knn_for_batch(knn_idx, batch):
    """Single-object: static (N, K) index used as-is. Multi-object (LM): a
    stacked (O, N, K) table gathered per sample by batch["obj_idx"] -- the
    TPU-native form of the reference's per-object knn_idx ModuleList indexing
    (`model/init_lm.py:64-69`)."""
    if getattr(knn_idx, "ndim", 2) == 3:
        return jnp.take(jnp.asarray(knn_idx), batch["obj_idx"], axis=0)
    return knn_idx


def device_labels(batch: Dict[str, jnp.ndarray], crop_size_gt: int):
    """GT labels from projections + final bbox, fully on device.

    Returns roi_bit (B, N, 1) f32, x_id/y_id (B, N) int32 at crop_size_gt
    resolution.
    """
    f = functools.partial(geometry.make_code_labels, crop_size_gt=crop_size_gt)
    roi_bit, x_id, y_id = jax.vmap(f)(batch["proj_xy"], batch["bbox"])
    return roi_bit[..., None], x_id, y_id


def continuous_rel_coords(batch: Dict[str, jnp.ndarray], crop_size_gt: int):
    """CONTINUOUS (un-truncated) keypoint coordinates in GT-crop cells.

    Same geometry as `geometry.make_code_labels` minus the trunc: returns
    x_rel/y_rel (B, N) f32 in [0, crop_size_gt) for in-roi keypoints.
    Feeds the coordinate-space regression aux loss (`_coord_reg_loss`),
    which needs the sub-cell target the per-bit BCE throws away.
    """
    S = crop_size_gt
    bbox = batch["bbox"]

    def one(proj_xy, bb):
        degenerate = (bb[2] <= 0) | (bb[3] <= 0)
        px = jnp.where(degenerate, 1.0, bb[2].astype(jnp.float32) / S)
        py = jnp.where(degenerate, 1.0, bb[3].astype(jnp.float32) / S)
        return ((proj_xy[:, 0] - bb[0]) / px, (proj_xy[:, 1] - bb[1]) / py)

    return jax.vmap(one)(batch["proj_xy"], bbox)


def _coord_reg_loss(x_logits, y_logits, x_rel, y_rel, roi_bit,
                    active_bits: int, res_log2: int):
    """Coordinate-space L1 between the sigmoid-EXPECTED id and the
    continuous GT coordinate, masked by the in-RoI bit.

    Why: per-bit BCE treats bits independently and cannot see coordinate-
    space bias — the round-3 proof run measured a per-image -4% radial
    shrinkage of the decoded field (tools/diag_scale_bias.py) that per-bit
    losses never penalize directly. E[id] = sum sigmoid(l_i) 2^(L-1-i) is
    the decoder's own expectation; pulling it to (x_rel - 0.5) at the
    active-bit resolution is a direct, differentiable anti-bias signal.
    Normalized by the active resolution so the weight is stage-stable.
    Opt-in (coord_reg_loss_weight, default 0 = reference parity; the
    reference trains pure per-bit BCE, losses/code_loss.py).
    """
    L = active_bits
    w = 2.0 ** jnp.arange(L - 1, -1, -1, dtype=jnp.float32)
    ex = jnp.sum(jax.nn.sigmoid(x_logits.astype(jnp.float32)) * w, axis=-1)
    ey = jnp.sum(jax.nn.sigmoid(y_logits.astype(jnp.float32)) * w, axis=-1)
    scale = 2.0 ** (res_log2 - active_bits)   # GT cells per active-bit cell
    # target in active-bit units; -0.5 because ids floor (cell corner):
    # a perfectly calibrated E[id] equals the continuous coord - 0.5
    tx = x_rel / scale - 0.5
    ty = y_rel / scale - 0.5
    m = roi_bit[..., 0]
    n = jnp.maximum(jnp.sum(m), 1.0)
    res = 2.0 ** active_bits
    return (jnp.sum(jnp.abs(ex - tx) * m) + jnp.sum(jnp.abs(ey - ty) * m)) / (2.0 * n * res)


def device_augment_normalize(images_u8, key, use_pepper_salt, use_motion_blur,
                             train: bool, color_aug_prob: float = 0.8):
    imgs = images_u8.astype(jnp.float32)
    if train and color_aug_prob > 0:
        keys = jax.random.split(key, imgs.shape[0])
        aug = functools.partial(augment.color_augment,
                                use_pepper_salt=use_pepper_salt,
                                use_motion_blur=use_motion_blur,
                                apply_prob=color_aug_prob)
        imgs = jax.vmap(aug)(keys, imgs)
    return crop.normalize_image(imgs)


def _aux_heatmap_loss(resp, roi_bit, x_id, y_id, total_bits: int):
    """Auxiliary dense supervision of the init net's per-keypoint 8x8
    response maps: softmax-CE at the GT cell, masked by the in-RoI bit.

    resp: (B, N, 64) conv1x1 response-map logits (InitNet sows them);
    x_id/y_id: int ids at 2**total_bits resolution.

    Why this exists: the reference always fine-tunes an ImageNet-pretrained
    backbone (model/backbone.py:39-50); no pretrained weights exist in this
    environment, and from scratch the three-way co-adaptation
    backbone <-> conv1x1 <-> bit-decoder is measured to stall at chance
    (tools/diag_overfit.py: x/y bits stay at ~0.5 even overfitting 64 fixed
    images, while the same decoder trained on ideal features converges --
    tools/diag_head_toy.py). The heatmap loss gives every keypoint channel a
    well-posed dense gradient, bootstrapping the binding; it is OFF (weight 0)
    in all reference-parity configs.
    """
    shift = total_bits - 3
    x3 = (x_id >> shift).astype(jnp.int32)
    y3 = (y_id >> shift).astype(jnp.int32)
    cell = y3 * 8 + x3                                     # row-major h*W+w
    ce = optax.softmax_cross_entropy_with_integer_labels(resp, cell)
    m = roi_bit[..., 0]
    return jnp.sum(ce * m) / jnp.clip(jnp.sum(m), 1.0, None)


def _aux_refine_loss(inter, roi_bit, x_id, y_id, res_log2: int, stage: int):
    """Dense supervision of the UpBlock feature maps at every active refine
    resolution: softmax-CE of each keypoint's response map (sown by
    PoseNet(aux_refine_heads=True)) at the GT cell, masked by in-RoI.

    The refine-resolution analog of `_aux_heatmap_loss`: the refine bits read
    the upsampled maps only through a 4-point gather per keypoint, which
    starves the maps of localization gradient from a random init (measured:
    refine bits 3-5 end a 47k-step from-scratch run at 0.24/0.46/0.50 error
    while init bits crack — ACCURACY.md). OFF (weight 0) in reference-parity
    configs.
    """
    m = roi_bit[..., 0]
    denom = jnp.clip(jnp.sum(m), 1.0, None)
    total = 0.0
    for i in range(stage):
        r = 4 + i                       # up_i output is 2**(4+i) square
        resp = inter[f"refine_resp_{i}"][0].astype(jnp.float32)  # (B,N,HW)
        shift = res_log2 - r
        cell = ((y_id >> shift) * (1 << r) + (x_id >> shift)).astype(jnp.int32)
        ce = optax.softmax_cross_entropy_with_integer_labels(resp, cell)
        total = total + jnp.sum(ce * m) / denom
    return total / stage


def _code_labels_bits(x_id, y_id, total_bits: int, use_bits: int):
    """ids at 2**total_bits resolution -> first `use_bits` MSB code planes
    (B, N, use_bits) f32. MSB-prefix slicing == the reference's
    `pixel_x_codes[:, :res_log2]` (`pretrain.py:262-267`)."""
    xc = codes.ids_to_codes(x_id, total_bits)[..., :use_bits].astype(jnp.float32)
    yc = codes.ids_to_codes(y_id, total_bits)[..., :use_bits].astype(jnp.float32)
    return xc, yc


def make_pretrain_step(net, knn_idx, optimizer: optax.GradientTransformation,
                       crop_size_gt: int, *, mask_loss_type="BCE",
                       proj_loss_type="BCE", proj_bit_loss_weight=1.0,
                       use_pepper_salt=True, use_motion_blur=True,
                       color_aug_prob=0.8, aux_heatmap_weight=0.0):
    total_bits = int(jnp.log2(crop_size_gt))
    res_log2 = net.res_log2
    mutable = ["batch_stats"] + (["intermediates"] if aux_heatmap_weight else [])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: Dict[str, Any], batch, key):
        imgs = device_augment_normalize(batch["image"], key, use_pepper_salt,
                                        use_motion_blur, train=True,
                                        color_aug_prob=color_aug_prob)
        roi_bit, x_id, y_id = device_labels(batch, crop_size_gt)
        gt_x, gt_y = _code_labels_bits(x_id, y_id, total_bits, res_log2)
        knn_b = knn_for_batch(knn_idx, batch)

        def loss_fn(params):
            (out_bits, _, _), updates = net.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                imgs, knn_b, train=True, mutable=mutable)
            roi_logit = out_bits[..., 0:1]
            x_logit = out_bits[..., 1:1 + res_log2]
            y_logit = out_bits[..., 1 + res_log2:]
            l_roi = unmasked_code_loss(roi_logit, roi_bit, mask_loss_type)
            l_x = masked_code_loss(x_logit, gt_x, roi_bit, proj_loss_type)
            l_y = masked_code_loss(y_logit, gt_y, roi_bit, proj_loss_type)
            total = l_roi + proj_bit_loss_weight * (l_x + l_y)
            metrics = {"loss": total, "loss_roi": l_roi,
                       "loss_x": l_x, "loss_y": l_y}
            if aux_heatmap_weight:
                resp = updates["intermediates"]["resp_map"][0]
                l_aux = _aux_heatmap_loss(resp, roi_bit, x_id, y_id, total_bits)
                total = total + aux_heatmap_weight * l_aux
                metrics = dict(metrics, loss=total, loss_aux=l_aux)
            return total, (updates["batch_stats"], metrics)

        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, new_opt = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        new_state = {"params": new_params, "batch_stats": new_bs,
                     "opt_state": new_opt}
        return new_state, metrics

    return step


def make_init_eval_step(net, knn_idx, crop_size_gt: int):
    """Batched equivalent of the reference's `test_init` inner loop
    (`test_network_with_test_data.py:136-190`): per-sample mask-bit accuracy,
    reprojection accuracy, and per-bit errors -- all on device."""
    total_bits = int(jnp.log2(crop_size_gt))
    res_log2 = net.res_log2

    @jax.jit
    def step(variables, batch):
        imgs = device_augment_normalize(batch["image"], None, False, False, train=False)
        roi_bit, x_id, y_id = device_labels(batch, crop_size_gt)
        gt_x, gt_y = _code_labels_bits(x_id, y_id, total_bits, res_log2)

        out_bits, _, _ = net.apply(variables, imgs, knn_for_batch(knn_idx, batch),
                                   train=False)
        pred = (out_bits > 0.0).astype(jnp.float32)
        pred_mask = pred[..., 0:1]
        m = roi_bit  # GT mask, applied to both pred and gt codes (reference :150-153)
        pred_x = pred[..., 1:1 + res_log2] * m
        pred_y = pred[..., 1 + res_log2:] * m
        gt_xm, gt_ym = gt_x * m, gt_y * m

        n_in_roi = jnp.clip(jnp.sum(m[..., 0], axis=1), 1.0, None)     # (B,)
        err_mask = jnp.mean(jnp.abs(m - pred_mask), axis=(1, 2))       # (B,)
        dx = gt_xm - pred_x                                            # (B,N,L)
        dy = gt_ym - pred_y
        w = 2.0 ** (res_log2 - 1 - jnp.arange(res_log2))
        rex = jnp.sum(jnp.abs(jnp.sum(dx * w, axis=-1)), axis=1) / n_in_roi
        rey = jnp.sum(jnp.abs(jnp.sum(dy * w, axis=-1)), axis=1) / n_in_roi
        acc_x = 1.0 - rex / (2.0 ** res_log2)
        acc_y = 1.0 - rey / (2.0 ** res_log2)
        acc_mask = 1.0 - err_mask
        bit_err = jnp.concatenate([
            err_mask[:, None],
            jnp.sum(jnp.abs(dx), axis=1) / n_in_roi[:, None],
            jnp.sum(jnp.abs(dy), axis=1) / n_in_roi[:, None],
        ], axis=1)                                                     # (B, 1+2L)
        return {"acc_mask": acc_mask, "acc_x": acc_x, "acc_y": acc_y,
                "bit_err": bit_err}

    return step


def make_train_step(net, knn_idx, optimizer: optax.GradientTransformation,
                    stage: int, *, roi_loss_type="BCE", proj_loss_type="BCE",
                    seg_visib_loss_weight=1.0, seg_full_loss_weight=1.0,
                    use_pepper_salt=True, use_motion_blur=True,
                    full_bits=False, color_aug_prob=0.8, aux_heatmap_weight=0.0,
                    aux_refine_weight=0.0, teacher_force_prob=0.0,
                    coord_reg_weight=0.0, bit_weights=None,
                    prefix_correct_mask=False):
    """Full-pipeline train step; one compiled variant per curriculum stage.

    full_bits: the woProg ablation emits all res_log2 bits at every stage
    (models/ablation.py), so labels span the full code width.
    aux_refine_weight: weight of `_aux_refine_loss` (requires the net built
    with aux_refine_heads=True).
    teacher_force_prob: per-keypoint probability of teacher-forced refine
    conditioning (PoseNet tf_gather docstring); 0 = reference parity.
    bit_weights: optional length-`active_bits` per-bit x/y loss weights
    (the autonomous-tail fine-bit re-weighting lever, VERDICT r4 item 2);
    None = reference parity. Static per compiled step — the segmented-
    restart drivers re-build step fns each segment, so a schedule is
    approximated piecewise like the TF anneal.
    prefix_correct_mask: supervise each refine bit (index >= 3) ONLY at
    keypoints whose PREDICTED conditioning cell (the joint x/y bit prefix
    the refine gather actually used, `models/posenet.py` hard ids) matches
    the GT cell — plus TF-forced keypoints, whose conditioning is GT by
    construction. Rationale: with a wrong prefix cell the gathered refine
    features sit at the wrong image location, so the GT fine bit is not a
    function of the input the query head sees; BCE there labels noise.
    The reference (pure masked BCE over all bits,
    `checkerpose/losses/code_loss.py:29-62`) relies on low prefix error
    from its ImageNet-pretrained backbone; False = reference parity."""
    res_log2 = net.res_log2
    crop_size_gt = 2 ** res_log2
    active_bits = res_log2 if full_bits else 3 + stage
    if bit_weights is not None:
        assert len(bit_weights) == active_bits, (len(bit_weights), active_bits)
        bit_weights = jnp.asarray(bit_weights, jnp.float32)
    use_per_bit = (bit_weights is not None) or (prefix_correct_mask and not full_bits
                                                and active_bits > 3)
    mutable = ["batch_stats"] + (
        ["intermediates"] if (aux_heatmap_weight or aux_refine_weight) else [])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: Dict[str, Any], batch, key):
        k_aug, k_tf = jax.random.split(key)
        imgs = device_augment_normalize(batch["image"], k_aug, use_pepper_salt,
                                        use_motion_blur, train=True,
                                        color_aug_prob=color_aug_prob)
        roi_bit, x_id, y_id = device_labels(batch, crop_size_gt)
        gt_x, gt_y = _code_labels_bits(x_id, y_id, res_log2, active_bits)
        p3d = batch["p3d_normed"]
        knn_b = knn_for_batch(knn_idx, batch)
        # only PoseNet takes tf_gather; the woProg ablation has no refine loop
        tf_kw = {}
        if teacher_force_prob > 0:
            sel = jax.random.bernoulli(k_tf, teacher_force_prob, x_id.shape)
            tf_kw = {"tf_gather": (x_id, y_id, roi_bit, sel)}

        def loss_fn(params):
            out, updates = net.apply(
                {"params": params, "batch_stats": state["batch_stats"]},
                imgs, knn_b, p3d, stage=stage, train=True,
                mutable=mutable, **tf_kw)
            l_roi = unmasked_code_loss(out["roi_logit"], roi_bit, roi_loss_type)
            extra_metrics = {}
            if use_per_bit:
                bit_masks = None
                if prefix_correct_mask and not full_bits and active_bits > 3:
                    # 1 where ALL predicted x AND y bits < j match GT (the
                    # conditioning cell of refine bit j); init bits (<3) are
                    # image-conditioned, always supervised.
                    eq_x = 1.0 - jnp.abs((out["x_logits"] > 0).astype(jnp.float32) - gt_x)
                    eq_y = 1.0 - jnp.abs((out["y_logits"] > 0).astype(jnp.float32) - gt_y)
                    ones = jnp.ones_like(eq_x[..., :1])
                    pre_x = jnp.concatenate(
                        [ones, jnp.cumprod(eq_x, axis=-1)[..., :-1]], axis=-1)
                    pre_y = jnp.concatenate(
                        [ones, jnp.cumprod(eq_y, axis=-1)[..., :-1]], axis=-1)
                    cell_ok = pre_x * pre_y
                    if tf_kw:
                        cell_ok = jnp.maximum(
                            cell_ok, sel.astype(jnp.float32)[..., None])
                    j = jnp.arange(active_bits)
                    bit_masks = jax.lax.stop_gradient(
                        jnp.where(j[None, None, :] < 3, 1.0, cell_ok))
                    # fraction of in-roi keypoints whose finest-bit
                    # conditioning cell is correct (supervision coverage)
                    extra_metrics["finebit_sup_frac"] = (
                        jnp.sum(bit_masks[..., -1] * roi_bit[..., 0])
                        / jnp.clip(jnp.sum(roi_bit[..., 0]), 1.0, None))
                l_x = per_bit_masked_code_loss(out["x_logits"], gt_x, roi_bit,
                                               bit_masks, bit_weights,
                                               proj_loss_type)
                l_y = per_bit_masked_code_loss(out["y_logits"], gt_y, roi_bit,
                                               bit_masks, bit_weights,
                                               proj_loss_type)
            else:
                l_x = masked_code_loss(out["x_logits"], gt_x, roi_bit, proj_loss_type)
                l_y = masked_code_loss(out["y_logits"], gt_y, roi_bit, proj_loss_type)
            l_sv = mask_loss_interpolate(out["seg_logits"][..., 0], batch["mask_visib"])
            l_sf = mask_loss_interpolate(out["seg_logits"][..., 1], batch["mask_full"])
            total = (l_roi + l_x + l_y + seg_visib_loss_weight * l_sv
                     + seg_full_loss_weight * l_sf)
            metrics = {"loss": total, "loss_roi": l_roi, "loss_x": l_x,
                       "loss_y": l_y, "loss_seg_visib": l_sv,
                       "loss_seg_full": l_sf, **extra_metrics}
            if aux_heatmap_weight:
                resp = updates["intermediates"]["init_net"]["resp_map"][0]
                l_aux = _aux_heatmap_loss(resp, roi_bit, x_id, y_id, res_log2)
                total = total + aux_heatmap_weight * l_aux
                metrics = dict(metrics, loss=total, loss_aux=l_aux)
            if aux_refine_weight:
                l_ref = _aux_refine_loss(updates["intermediates"], roi_bit,
                                         x_id, y_id, res_log2, stage)
                total = total + aux_refine_weight * l_ref
                metrics = dict(metrics, loss=total, loss_aux_refine=l_ref)
            if coord_reg_weight:
                x_rel, y_rel = continuous_rel_coords(batch, crop_size_gt)
                l_coord = _coord_reg_loss(out["x_logits"], out["y_logits"],
                                          x_rel, y_rel, roi_bit,
                                          active_bits, res_log2)
                total = total + coord_reg_weight * l_coord
                metrics = dict(metrics, loss=total, loss_coord=l_coord)
            return total, (updates["batch_stats"], metrics)

        (loss, (new_bs, metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state["params"])
        updates, new_opt = optimizer.update(grads, state["opt_state"], state["params"])
        new_params = optax.apply_updates(state["params"], updates)
        return {"params": new_params, "batch_stats": new_bs,
                "opt_state": new_opt}, metrics

    return step


def make_pose_forward(net, knn_idx, stage: int):
    """Jitted inference forward: uint8 crops -> hard ids + masks + seg."""

    @jax.jit
    def fwd(variables, batch):
        imgs = device_augment_normalize(batch["image"], None, False, False, train=False)
        out = net.apply(variables, imgs, knn_for_batch(knn_idx, batch),
                        batch["p3d_normed"], stage=stage, train=False)
        roi_mask = (out["roi_logit"][..., 0] > 0.0).astype(jnp.float32)  # (B,N)
        seg = jax.nn.sigmoid(out["seg_logits"])
        return {"roi_mask": roi_mask, "x_id": out["x_id"], "y_id": out["y_id"],
                "x_logits": out["x_logits"], "y_logits": out["y_logits"],
                "seg_visib": seg[..., 0], "seg_full": seg[..., 1]}

    return fwd
