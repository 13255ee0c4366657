"""Crop dataset + host input pipeline.

TPU-first split of the reference's torch Dataset
(`bop_dataset_pytorch.py:240-405`):
  * host side (here): PNG decode, bbox selection (train jitter / test padding
    or detector box), crop+resize, keypoint projection -- cheap numpy/cv2.
  * device side (train/eval steps): color augmentation (ops.augment), ImageNet
    normalization, and GT binary-code label generation
    (ops.geometry.make_code_labels + ops.codes.ids_to_codes) -- fused into the
    jitted step, so the host never touches per-keypoint label tensors.

Batches are plain dicts of stacked numpy arrays; a background thread
prefetches ahead of the accelerator (this host has one CPU core -- decode
overlaps with TPU compute, not with itself).
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from checkerpose_tpu.data.bop_io import Sample
from checkerpose_tpu.ops import geometry
from checkerpose_tpu.ops.crop import get_roi_np


class CropDataset:
    """Per-object crop dataset over a Sample manifest."""

    def __init__(self, samples: List[Sample], p3d_xyz, *,
                 is_train: bool, crop_size_img: int = 256, crop_size_gt: int = 64,
                 padding_ratio: float = 1.5, resize_method: str = "crop_square_resize",
                 use_detections: bool = False, seed: int = 0,
                 bg_paths: Optional[List[str]] = None, change_bg_prob: float = 0.0,
                 use_native: Optional[bool] = None, frame_cache=None):
        """p3d_xyz: (N, 3) keypoints shared by all samples, or a
        {obj_id: (N, 3)} dict for multi-object (LM) datasets -- items then
        carry `obj_idx`, the row into the stacked keypoint/KNN tables.

        bg_paths/change_bg_prob: train-time background replacement (the
        reference's VOC bg swap for LM synthetic data,
        `lm_dataset_pytorch.py:489-523`): with prob change_bg_prob, pixels
        outside the full mask are replaced by a random background image.
        """
        self.samples = samples
        if isinstance(p3d_xyz, dict):
            self.p3d_table = {k: np.asarray(v, np.float64) for k, v in p3d_xyz.items()}
            self.obj_id_to_idx = {oid: i for i, oid in enumerate(sorted(self.p3d_table))}
            self.p3d = next(iter(self.p3d_table.values()))
        else:
            self.p3d_table = None
            self.obj_id_to_idx = None
            self.p3d = np.asarray(p3d_xyz, np.float64)
        self.bg_paths = bg_paths
        self.change_bg_prob = change_bg_prob
        # pre-decoded raw-frame cache (data/framestore.py): removes PNG
        # decode from the hot path on decode-bound hosts
        self.frame_cache = frame_cache
        if use_native is None:
            # default ON when the C++ core is available and nothing requires
            # host-python per-image work (bg swap needs the full-frame mask;
            # a frame cache already beats decode)
            use_native = not bg_paths and frame_cache is None
        # native C++ decode+crop core (native/loadercore.cpp); incompatible
        # with host-side bg replacement (needs the full-frame mask)
        self.use_native = use_native and not bg_paths
        if self.use_native:
            from checkerpose_tpu.data import native_loader
            self.use_native = native_loader.available()
        self.is_train = is_train
        self.crop_size_img = crop_size_img
        self.crop_size_gt = crop_size_gt
        self.padding_ratio = padding_ratio
        self.resize_method = resize_method
        self.use_detections = use_detections
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.samples)

    def dummy_item(self, s: Sample) -> Dict[str, np.ndarray]:
        """Missing detection -> zero input (reference
        `bop_dataset_pytorch.py:325-338`); `valid`=0 lets eval skip it."""
        S = self.crop_size_img
        return {
            "image": np.zeros((S, S, 3), np.uint8),
            "mask_visib": np.zeros((self.crop_size_gt, self.crop_size_gt), np.float32),
            "mask_full": np.zeros((self.crop_size_gt, self.crop_size_gt), np.float32),
            "R": s.R.astype(np.float32), "t": s.t.astype(np.float32),
            "bbox": np.zeros(4, np.float32),
            "cam_K": s.cam_K.astype(np.float32),
            "proj_xy": np.zeros((self.p3d.shape[0], 2), np.float32),
            "obj_id": np.int32(s.obj_id),
            "obj_idx": np.int32(self.obj_id_to_idx[s.obj_id] if self.obj_id_to_idx else 0),
            "scene_id": np.int32(s.scene_id), "im_id": np.int32(s.im_id),
            "valid": np.float32(0.0),
        }

    def _choose_bbox(self, s: Sample) -> np.ndarray:
        """Train: jittered GT bbox; eval: padded detector/GT bbox. One place
        for all three item paths (python, native single, native batch)."""
        if self.is_train:
            return geometry.aug_bbox(s.bbox_visib, self.padding_ratio, self.rng)
        base = s.detect_bbox if self.use_detections else s.bbox_visib
        return geometry.padding_bbox(base, self.padding_ratio)

    def _sample_dict(self, s: Sample, image, mask_visib, mask_full, bbox,
                     valid: float, im_w: int, im_h: int) -> Dict[str, np.ndarray]:
        """Assemble the per-item dict shared by every load path."""
        p3d = self.p3d_table[s.obj_id] if self.p3d_table else self.p3d
        proj_xy, _ = geometry.project_pts(p3d, s.cam_K, s.R, s.t)
        final = geometry.final_bbox(bbox, self.resize_method, im_w, im_h)
        return {
            "image": image, "mask_visib": mask_visib, "mask_full": mask_full,
            "R": s.R.astype(np.float32), "t": s.t.astype(np.float32),
            "bbox": final.astype(np.float32),
            "cam_K": s.cam_K.astype(np.float32),
            "proj_xy": proj_xy.astype(np.float32),
            "obj_id": np.int32(s.obj_id),
            "obj_idx": np.int32(self.obj_id_to_idx[s.obj_id]
                                if self.obj_id_to_idx else 0),
            "scene_id": np.int32(s.scene_id), "im_id": np.int32(s.im_id),
            "valid": np.float32(valid),
        }

    def _read_sample(self, s: Sample):
        """(rgb, mask_visib, mask_full) from the frame cache when present,
        else cv2 decode. lm_imgn samples carry a depth_path instead of mask
        files: masks = depth > 0 (reference lm_dataset_pytorch.py:368-371).
        Returns None on any decode failure."""
        img = mask_visib = mask_full = None
        if self.frame_cache is not None:
            img = self.frame_cache.get_frame(s.rgb_path)
            if s.mask_visib_path:
                mask_visib = self.frame_cache.get_mask(s.mask_visib_path)
                mask_full = self.frame_cache.get_mask(s.mask_path)
        if img is None:
            img = cv2.imread(s.rgb_path)
            img = img[:, :, ::-1] if img is not None else None  # BGR -> RGB
        if mask_visib is None and getattr(s, "depth_path", None):
            depth = cv2.imread(s.depth_path, cv2.IMREAD_UNCHANGED)
            if depth is not None:
                mask_visib = (depth > 0).astype(np.uint8) * 255
                mask_full = mask_visib.copy()
        if mask_visib is None:
            mask_visib = cv2.imread(s.mask_visib_path, 0)
        if mask_full is None:
            mask_full = cv2.imread(s.mask_path, 0)
        if img is None or mask_visib is None or mask_full is None:
            return None
        return img, mask_visib, mask_full

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        s = self.samples[index]
        if self.use_detections and s.detect_bbox is None:
            return self.dummy_item(s)
        if self.use_native and not getattr(s, "depth_path", None):
            try:
                return self._native_item(s)
            except Exception as e:  # corrupt input: degrade, don't kill the run
                print(f"cannot load sample {s.rgb_path}: {e}", flush=True)
                return self.dummy_item(s)

        # decode failure -> dummy sample with valid=0, matching the
        # reference's swallow-and-print recovery (bop_dataset_pytorch.py:297-322)
        decoded = self._read_sample(s)
        if decoded is None:
            print(f"cannot load sample {s.rgb_path}", flush=True)
            return self.dummy_item(s)
        img, mask_visib, mask_full = decoded

        # "syn" renders always get a background (they have none); real images
        # swap with prob change_bg_prob (reference lm_dataset_pytorch.py:380-384)
        if self.is_train and self.bg_paths and (
                getattr(s, "img_type", "real") == "syn"
                or self.rng.random() < self.change_bg_prob):
            img = self._replace_bg(img, mask_full)

        bbox = self._choose_bbox(s)
        roi_img = get_roi_np(img, bbox, self.crop_size_img, "linear", self.resize_method)
        roi_mv = get_roi_np(mask_visib, bbox, self.crop_size_gt, "nearest", self.resize_method)
        roi_mf = get_roi_np(mask_full, bbox, self.crop_size_gt, "nearest", self.resize_method)
        return self._sample_dict(
            s, np.ascontiguousarray(roi_img),               # uint8 HWC
            roi_mv.astype(np.float32) / 255.0,
            roi_mf.astype(np.float32) / 255.0,
            bbox, 1.0, img.shape[1], img.shape[0])

    def _native_item(self, s: Sample) -> Dict[str, np.ndarray]:
        """Single-call C++ decode + square-crop + resize (exact cv2 parity,
        see native/loadercore.cpp)."""
        from checkerpose_tpu.data import native_loader
        bbox = self._choose_bbox(s)
        img, mf, mv, (w, h) = native_loader.load_sample(
            s.rgb_path, s.mask_path, s.mask_visib_path,
            bbox.astype(np.float64), self.crop_size_img, self.crop_size_gt)
        return self._sample_dict(s, img, mv, mf, bbox, 1.0, w, h)

    def supports_batch(self) -> bool:
        """True when whole batches can be assembled in ONE native call
        (threaded C++ decode+crop+resize, native/loadercore.cpp). The batch
        API does not report source image sizes, so only the square resize
        methods (whose final bbox ignores them, ops/geometry.py::final_bbox)
        qualify."""
        return bool(self.use_native) and self.resize_method in (
            "crop_square_resize", "crop_resize_by_warp_affine")

    def get_batch(self, indices) -> Dict[str, np.ndarray]:
        """Batch assembly via the threaded native core (round-1 VERDICT weak
        #5: the C++ thread pool was never used in training). Failed decodes
        are zero-filled by the core; they surface as valid=0 via their empty
        visib mask (a real sample always has visible pixels -- the manifest
        filters visib_fract)."""
        from checkerpose_tpu.data import native_loader
        items = [self.samples[int(j)] for j in indices]
        native_rows, batch_items = [], []
        for s in items:
            if (self.use_detections and s.detect_bbox is None) or \
                    getattr(s, "depth_path", None):
                batch_items.append(self.dummy_item(s) if s.detect_bbox is None
                                   and self.use_detections else None)
            else:
                batch_items.append(None)
                native_rows.append(s)
        # per-python-path leftovers (lm_imgn depth samples)
        for i, s in enumerate(items):
            if batch_items[i] is None and getattr(s, "depth_path", None):
                batch_items[i] = self[int(indices[i])]

        if native_rows:
            bboxes = [self._choose_bbox(s) for s in native_rows]
            imgs, mf, mv, n_fail = native_loader.load_batch(
                [s.rgb_path for s in native_rows],
                [s.mask_path for s in native_rows],
                [s.mask_visib_path for s in native_rows],
                np.stack(bboxes), self.crop_size_img, self.crop_size_gt)
            if n_fail:
                print(f"native loader: {n_fail} failed decodes zero-filled",
                      flush=True)
            ni = 0
            for i, s in enumerate(items):
                if batch_items[i] is not None:
                    continue
                b = bboxes[ni]
                # failed decodes are zero-filled by the core and surface as
                # an empty visib mask -> valid=0; image w/h only matter for
                # final_bbox clipping under crop_resize (square methods
                # ignore them) — if crop_resize is ever wired into the
                # native batch path, this placeholder would silently corrupt
                # final_bbox, so fail loudly here rather than downstream
                assert self.resize_method in (
                    "crop_square_resize", "crop_resize_by_warp_affine"), (
                    f"native get_batch uses a placeholder image size that is "
                    f"only valid for resize methods whose final_bbox ignores "
                    f"it (the square methods), got {self.resize_method!r}")
                batch_items[i] = self._sample_dict(
                    s, imgs[ni], mv[ni], mf[ni], b,
                    1.0 if mv[ni].max() > 0 else 0.0,
                    int(b[0] + b[2] + 1), int(b[1] + b[3] + 1))
                ni += 1
        return _stack(batch_items)

    def _replace_bg(self, img, mask_full):
        path = self.bg_paths[int(self.rng.integers(len(self.bg_paths)))]
        bg = cv2.imread(path)
        if bg is None:
            return img
        bg = bg[:, :, ::-1]
        bg = cv2.resize(bg, (img.shape[1], img.shape[0]), interpolation=cv2.INTER_LINEAR)
        out = img.copy()
        fg = mask_full > 127
        out[~fg] = bg[~fg]
        return out


def _stack(items: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([it[k] for it in items]) for k in items[0]}


class Loader:
    """Infinite shuffled (train) or single-pass (eval) batch iterator with
    background-thread prefetch."""

    def __init__(self, dataset: CropDataset, batch_size: int, *, shuffle: bool,
                 drop_last: bool = True, prefetch: int = 4, seed: int = 0,
                 infinite: bool = False):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.infinite = infinite
        self.rng = np.random.default_rng(seed)

    def _index_stream(self):
        n = len(self.ds)
        while True:
            order = self.rng.permutation(n) if self.shuffle else np.arange(n)
            for i in range(0, n, self.batch_size):
                chunk = order[i:i + self.batch_size]
                if len(chunk) < self.batch_size:
                    if self.drop_last:
                        break
                    # pad by repeating (eval masks these out via `valid`)
                    pad = np.resize(order, self.batch_size - len(chunk))
                    chunk = np.concatenate([chunk, pad])
                yield chunk, len(order[i:i + self.batch_size])
            if not self.infinite:
                return

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        use_batch_api = hasattr(self.ds, "supports_batch") and self.ds.supports_batch()

        def worker():
            # any exception is shipped to the consumer instead of dying
            # silently in the daemon thread (which would hang q.get())
            try:
                for chunk, n_real in self._index_stream():
                    if use_batch_api:
                        batch = self.ds.get_batch(chunk)
                    else:
                        items = [self.ds[int(j)] for j in chunk]
                        batch = _stack(items)
                    batch["n_real"] = np.int32(n_real)
                    q.put(batch)
                q.put(stop)
            except BaseException as e:  # noqa: BLE001
                q.put(e)

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        while True:
            batch = q.get()
            if batch is stop:
                return
            if isinstance(batch, BaseException):
                raise batch
            yield batch


def mixed_batch_sizes(batch_size: int, second_dataset_ratio: float):
    """Split a global batch across two datasets (reference
    `common_ops.get_batch_size:43`: batch2 = round(batch * ratio))."""
    b2 = int(round(batch_size * second_dataset_ratio))
    return batch_size - b2, b2


class MixedLoader:
    """Concatenates fixed-ratio sub-batches from two loaders per step
    (the reference's dual-DataLoader mixing, `train.py:274-293`)."""

    def __init__(self, loader1: Loader, loader2: Loader):
        self.loader1 = loader1
        self.loader2 = loader2

    def __iter__(self):
        it1, it2 = iter(self.loader1), iter(self.loader2)
        while True:
            b1 = next(it1, None)
            b2 = next(it2, None)
            if b1 is None or b2 is None:
                return
            out = {k: np.concatenate([b1[k], b2[k]]) for k in b1 if k != "n_real"}
            out["n_real"] = b1["n_real"] + b2["n_real"]
            yield out
