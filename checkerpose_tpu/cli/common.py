"""Shared CLI plumbing: config-driven dataset/model construction.

Mirrors the reference entry points' setup blocks (`pretrain.py:32-218`,
`train.py:43-248`) with the same cfg keys and path-derivation conventions
(`train.py:381-411`: checkpoint/tensorboard dirs are
<base>/<cfg_name>/<obj_name>).
"""
from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import numpy as np

# persistent XLA compile cache: first HRNet jit is minutes on this 1-core
# host, cached reruns are seconds (CLAUDE.md env rule 5)
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 "/root/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from checkerpose_tpu.config import parse_cfg
from checkerpose_tpu.data.bop_io import scan_bop_object, scan_bop_targets, load_models_info
from checkerpose_tpu.data.dataset import CropDataset, Loader, MixedLoader, mixed_batch_sizes
from checkerpose_tpu.data.dataset_info import get_obj_info
from checkerpose_tpu.data.detections import load_detections, attach_detections
from checkerpose_tpu.data.fps import load_keypoints_normed
from checkerpose_tpu.ops.knn import knn_index


def resolve_cfg(cfg_path: str, obj_name: str, overrides: Optional[Dict] = None) -> Dict:
    cfg = parse_cfg(cfg_path)
    cfg["config_file_name"] = os.path.splitext(os.path.basename(cfg_path))[0]
    cfg["obj_name"] = obj_name
    if overrides:
        cfg.update({k: v for k, v in overrides.items() if v is not None})
    names, syms = get_obj_info(cfg["dataset_name"])
    cfg["obj_id"] = names[obj_name]
    cfg["is_symmetric"] = obj_name in syms
    # derived artifact dirs: <base>/<cfg_name>/<obj_name>
    for key, base in (("check_point_path", "experiments/checkpoints"),
                      ("tensorboard_path", "experiments/tensorboard_logs/runs")):
        root = cfg.get(key, base)
        cfg[key] = os.path.join(root, cfg["config_file_name"], obj_name)
    return cfg


def load_keypoints(cfg: Dict):
    num_p3d = 2 ** int(cfg["num_p3d_log2"])
    xyz, normed = load_keypoints_normed(cfg["bop_path"], cfg["dataset_name"],
                                        cfg["obj_id"], num_p3d,
                                        cfg.get("fps_version", "fps_202212"))
    graph_k = int(cfg.get("network_graph_k", cfg.get("init_network_graph_k", 20)))
    knn = knn_index(normed, min(graph_k, len(normed)))
    return xyz, normed, knn


def _frame_cache(cfg: Dict):
    """Open the pre-decoded frame cache when cfg names one (or when the
    dataset ships a `frame_cache/` dir, as the scaled synthetic set does)."""
    cand = cfg.get("frame_cache_dir")
    if not cand or cand == "none":
        cand = os.path.join(cfg["bop_path"], cfg["dataset_name"], "frame_cache")
    if os.path.isfile(os.path.join(str(cand), "index.json")):
        from checkerpose_tpu.data.framestore import FrameCache
        return FrameCache(str(cand))
    return None


def build_train_loaders(cfg: Dict, xyz: np.ndarray, seed: int = 0):
    """Train loader (optionally mixing two folders at second_dataset_ratio)
    + validation loader."""
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    crop_gt = int(cfg.get("BoundingBox_CropSize_GT", 2 ** int(cfg.get("network_res_log2", 6))))
    common = dict(crop_size_img=crop_img, crop_size_gt=crop_gt,
                  padding_ratio=float(cfg.get("padding_ratio", 1.5)),
                  resize_method=cfg.get("resize_method", "crop_square_resize"),
                  frame_cache=_frame_cache(cfg))
    vt = float(cfg.get("train_obj_visible_theshold", 0.1))
    batch = int(cfg["batch_size"])

    s1 = scan_bop_object(cfg["bop_path"], cfg["dataset_name"],
                         cfg["training_data_folder"], cfg["obj_id"], vt)
    folder2 = cfg.get("training_data_folder_2", "none")
    if folder2 and folder2 != "none":
        s2 = scan_bop_object(cfg["bop_path"], cfg["dataset_name"], folder2,
                             cfg["obj_id"], vt)
        b1, b2 = mixed_batch_sizes(batch, float(cfg.get("second_dataset_ratio", 0.75)))
        l1 = Loader(CropDataset(s1, xyz, is_train=True, seed=seed, **common),
                    b1, shuffle=True, infinite=True, seed=seed)
        l2 = Loader(CropDataset(s2, xyz, is_train=True, seed=seed + 1, **common),
                    b2, shuffle=True, infinite=True, seed=seed + 1)
        train_loader = MixedLoader(l1, l2)
    else:
        train_loader = Loader(CropDataset(s1, xyz, is_train=True, seed=seed, **common),
                              batch, shuffle=True, infinite=True, seed=seed)

    sv = scan_bop_object(cfg["bop_path"], cfg["dataset_name"],
                         cfg.get("val_folder", "test"), cfg["obj_id"], 0.1)
    val_ds = CropDataset(sv, xyz, is_train=False, **common)
    val_loader_factory = lambda: Loader(val_ds, batch, shuffle=False,  # noqa: E731
                                        drop_last=False, infinite=False)
    return train_loader, val_loader_factory


def build_test_loader(cfg: Dict, xyz: np.ndarray, batch_size: int = 16,
                      crop_gt: Optional[int] = None):
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    crop_gt = crop_gt or 2 ** int(cfg.get("network_res_log2", 6))
    if cfg.get("bop_challange", False):
        samples = scan_bop_targets(cfg["bop_path"], cfg["dataset_name"],
                                   cfg["obj_id"], cfg.get("test_folder", "test"))
    else:
        samples = scan_bop_object(cfg["bop_path"], cfg["dataset_name"],
                                  cfg.get("test_folder", "test"), cfg["obj_id"], 0.1)
    det_path = cfg.get("Detection_reaults", "none")
    use_det = bool(det_path) and det_path != "none"
    if use_det:
        det = load_detections(det_path, cfg["obj_id"])
        samples = attach_detections(samples, det)
    ds = CropDataset(samples, xyz, is_train=False, crop_size_img=crop_img,
                     crop_size_gt=crop_gt,
                     padding_ratio=float(cfg.get("padding_ratio", 1.5)),
                     resize_method=cfg.get("resize_method", "crop_square_resize"),
                     use_detections=use_det, frame_cache=_frame_cache(cfg))
    return Loader(ds, batch_size, shuffle=False, drop_last=False, infinite=False), samples


def build_val_slice_loader_factory(cfg: Dict, xyz: np.ndarray, *,
                                   max_images: int = 32,
                                   batch_size: int = 16,
                                   crop_gt: Optional[int] = None):
    """Loader factory over a SMALL held-out val slice (first `max_images`
    of `calib_folder`, GT boxes, no detections) for decode-tau calibration
    (VERDICT r3 #6). Returns a zero-arg factory because calibration sweeps
    the same slice once per candidate tau.

    `calib_folder` defaults to val_folder/test_folder for backward
    compatibility, but configs SHOULD point it at a training split
    (e.g. train_real): tau is a protocol hyperparameter and must not be
    tuned on the images it is later quoted on."""
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    crop_gt = crop_gt or 2 ** int(cfg.get("network_res_log2", 6))
    samples = scan_bop_object(
        cfg["bop_path"], cfg["dataset_name"],
        cfg.get("calib_folder",
                cfg.get("val_folder", cfg.get("test_folder", "test"))),
        cfg["obj_id"], 0.1)[:max_images]
    ds = CropDataset(samples, xyz, is_train=False, crop_size_img=crop_img,
                     crop_size_gt=crop_gt,
                     padding_ratio=float(cfg.get("padding_ratio", 1.5)),
                     resize_method=cfg.get("resize_method", "crop_square_resize"),
                     use_detections=False, frame_cache=_frame_cache(cfg))

    def factory():
        return Loader(ds, batch_size, shuffle=False, drop_last=False,
                      infinite=False)

    return factory


def attach_p3d(batch: Dict, p3dn: np.ndarray) -> Dict:
    """Attach per-sample normalized keypoints to a batch: a stacked (O, N, 3)
    multi-object table is gathered by obj_idx, a single-object (N, 3) array
    is broadcast. One helper for every CLI (they had drifted into four
    copies of two variants)."""
    if p3dn.ndim == 3:
        batch["p3d_normed"] = p3dn[batch["obj_idx"]]
    else:
        B = batch["image"].shape[0]
        batch["p3d_normed"] = np.broadcast_to(p3dn[None], (B,) + p3dn.shape).copy()
    return batch


def with_p3d(loader, p3dn: np.ndarray):
    for batch in loader:
        yield attach_p3d(batch, p3dn)


def solver_kwargs(cfg: Dict) -> Dict:
    """Reference-parity pose-solver tuning for the test CLIs.

    Maps the reference's flags (`test.py:553-558`, `test_lm.py:438-441`) onto
    this solver's knobs:
      * reprojErr_thresh -> reproj_thresh (same 2 px default; the reference
        passes it to BOTH Prog-X `threshold` and OpenCV `reprojectionError`);
      * spatial_coherence_weight / nbr_ball_radius -> the mean-field Potts
        coherence diffusion (solver/ransac.py:117-143), active only under
        --use_progressivex like the reference's Prog-X branch;
      * prog_max_iters / cv_max_iters (sequential RANSAC iteration caps) ->
        num_hyp, this solver's PARALLEL hypothesis count — the analogous
        work knob (explicit pnp_num_hyp wins).
    """
    use_px = bool(cfg.get("use_progressivex", False))
    max_iters = cfg.get("prog_max_iters") if use_px else cfg.get("cv_max_iters")
    return dict(
        num_hyp=int(cfg.get("pnp_num_hyp") or max_iters or 128),
        reproj_thresh=float(cfg.get("pnp_reproj_thresh")
                            or cfg.get("reprojErr_thresh") or 2.0),
        soft_inlier_sigma=(0.5 if use_px else 0.0),
        coherence_weight=(float(cfg.get("spatial_coherence_weight") or 0.1)
                          if use_px else 0.0),
        neighborhood_radius=float(cfg.get("nbr_ball_radius") or 20.0),
    )


def checkpoint_dir_arg(ckpt_dir, ckpt_file):
    """--ckpt_dir, with --ckpt_file accepted as a reference-CLI alias
    (`test.py:551`); orbax checkpoints are directories, so a file path
    degrades to its parent."""
    ckpt = ckpt_dir or ckpt_file
    if ckpt and os.path.isfile(ckpt):
        ckpt = os.path.dirname(ckpt)
    return ckpt


def object_diameter(cfg: Dict) -> float:
    info = load_models_info(cfg["bop_path"], cfg["dataset_name"], eval_models=False)
    return float(info[cfg["obj_id"]]["diameter"])


# ---------------------------------------------------------------------------
# multi-object (LM 13-object shared estimator)
# ---------------------------------------------------------------------------

def resolve_cfg_lm(cfg_path: str, overrides: Optional[Dict] = None) -> Dict:
    """LM config: one shared estimator over the 13 Linemod objects
    (reference `train_lm.py`, `lm_dataset_pytorch.py`)."""
    from checkerpose_tpu.data.dataset_info import LM13_OBJECTS
    cfg = parse_cfg(cfg_path)
    cfg["config_file_name"] = os.path.splitext(os.path.basename(cfg_path))[0]
    if overrides:
        cfg.update({k: v for k, v in overrides.items() if v is not None})
    cfg.setdefault("dataset_name", "lm")
    # the reference's LM configs use `datasets_root` instead of bop_path
    if "bop_path" not in cfg and "datasets_root" in cfg:
        cfg["bop_path"] = cfg["datasets_root"]
    names, syms = get_obj_info(cfg["dataset_name"])
    obj_names = cfg.get("obj_names")
    if isinstance(obj_names, str):
        # cfg-file form: comma- or whitespace-separated object names
        obj_names = [n for n in obj_names.replace(",", " ").split() if n]
    cfg["obj_names"] = list(obj_names or LM13_OBJECTS)
    cfg["obj_ids"] = [names[n] for n in cfg["obj_names"]]
    cfg["symmetric_names"] = set(syms)
    for key, base in (("check_point_path", "experiments/checkpoints"),
                      ("tensorboard_path", "experiments/tensorboard_logs/runs")):
        root = cfg.get(key, base)
        cfg[key] = os.path.join(root, cfg["config_file_name"], "lm13")
    return cfg


def load_keypoints_lm(cfg: Dict):
    """Stacked per-object tables: ({obj_id: (N,3)} mm, p3d_normed (O,N,3),
    knn (O,N,K)). Rows are ordered by sorted obj_id -- the same order
    CropDataset assigns obj_idx."""
    from checkerpose_tpu.ops.geometry import pc_normalize
    num_p3d = 2 ** int(cfg["num_p3d_log2"])
    graph_k = int(cfg.get("network_graph_k", cfg.get("init_network_graph_k", 20)))
    table = {}
    normed_rows, knn_rows = [], []
    for obj_id in sorted(cfg["obj_ids"]):
        xyz = load_keypoints_normed(cfg["bop_path"], cfg["dataset_name"],
                                    obj_id, num_p3d,
                                    cfg.get("fps_version", "fps_202212"))[0]
        table[obj_id] = xyz
        normed = pc_normalize(xyz.astype(np.float64)).astype(np.float32)
        normed_rows.append(normed)
        knn_rows.append(knn_index(normed, min(graph_k, num_p3d)))
    return table, np.stack(normed_rows), np.stack(knn_rows)


def build_train_loaders_lm(cfg: Dict, p3d_table: Dict, seed: int = 0):
    """Combined multi-object train loader + per-object val loader factories."""
    crop_img = int(cfg.get("BoundingBox_CropSize_image", 256))
    crop_gt = int(cfg.get("BoundingBox_CropSize_GT",
                          2 ** int(cfg.get("network_res_log2", 6))))
    common_kw = dict(crop_size_img=crop_img, crop_size_gt=crop_gt,
                     padding_ratio=float(cfg.get("padding_ratio", 1.5)),
                     resize_method=cfg.get("resize_method", "crop_square_resize"),
                     frame_cache=_frame_cache(cfg))
    vt = float(cfg.get("train_obj_visible_theshold", 0.1))
    batch = int(cfg["batch_size"])
    bg_paths = None
    bg_root = cfg.get("voc_background_root") or cfg.get("background_root")
    if bg_root and os.path.isdir(str(bg_root)):
        bg_paths = sorted(
            os.path.join(bg_root, f) for f in os.listdir(bg_root)
            if f.lower().endswith((".jpg", ".png", ".jpeg")))
    change_bg_prob = float(cfg.get("change_bg_prob", 0.0))

    def gather(folder):
        out = []
        for obj_id in sorted(cfg["obj_ids"]):
            out.extend(scan_bop_object(cfg["bop_path"], cfg["dataset_name"],
                                       folder, obj_id, vt))
        return out

    def gather_imgn():
        """lm_imgn synthetic renders as the second dataset (reference LM
        recipe: real + imgn mixed per step, get_lm_datasets.py:175-228)."""
        from checkerpose_tpu.data.lm_imgn import scan_lm_imgn
        id_to_name = {oid: n for n, oid in zip(cfg["obj_names"], cfg["obj_ids"])}
        n_per = int(cfg.get("imgn_n_per_obj", 1000))
        out = []
        for obj_id in sorted(cfg["obj_ids"]):
            out.extend(scan_lm_imgn(cfg["lm_imgn_root"], id_to_name[obj_id],
                                    obj_id, n_per_obj=n_per))
        return out

    s1 = gather(cfg["training_data_folder"])
    folder2 = cfg.get("training_data_folder_2", "none")
    if folder2 == "lm_imgn" and cfg.get("lm_imgn_root"):
        s2 = gather_imgn()
    elif folder2 and folder2 != "none":
        s2 = gather(folder2)
    else:
        s2 = None
    if s2:
        b1, b2 = mixed_batch_sizes(batch, float(cfg.get("second_dataset_ratio", 0.75)))
        l1 = Loader(CropDataset(s1, p3d_table, is_train=True, seed=seed,
                                bg_paths=bg_paths, change_bg_prob=change_bg_prob,
                                **common_kw), b1, shuffle=True, infinite=True, seed=seed)
        l2 = Loader(CropDataset(s2, p3d_table, is_train=True, seed=seed + 1,
                                bg_paths=bg_paths, change_bg_prob=change_bg_prob,
                                **common_kw), b2, shuffle=True, infinite=True, seed=seed + 1)
        train_loader = MixedLoader(l1, l2)
    else:
        train_loader = Loader(CropDataset(s1, p3d_table, is_train=True, seed=seed,
                                          bg_paths=bg_paths,
                                          change_bg_prob=change_bg_prob, **common_kw),
                              batch, shuffle=True, infinite=True, seed=seed)

    def val_loader_factory(obj_id):
        sv = scan_bop_object(cfg["bop_path"], cfg["dataset_name"],
                             cfg.get("val_folder", "test"), obj_id, 0.1)
        ds = CropDataset(sv, p3d_table, is_train=False, **common_kw)
        return Loader(ds, batch, shuffle=False, drop_last=False, infinite=False)

    return train_loader, val_loader_factory


def maybe_graft_pretrained_backbone(cfg, state):
    """Graft a NOCS-pretrained backbone (cli/pretrain_backbone.py) into a
    fresh InitNet state when cfg `backbone_pretrain_checkpoint` is set.

    The in-framework substitute for the reference's ImageNet-pretrained
    timm init (`model/backbone.py:39-50`; unavailable offline). Shapes are
    validated leaf-by-leaf by models/convert.py::graft_backbone. Only fires
    at step 0 — a resumed run already carries the (further-trained)
    backbone.
    """
    bk_ck = cfg.get("backbone_pretrain_checkpoint")
    if not bk_ck or int(state.step) != 0:
        return state
    from checkerpose_tpu.models.convert import graft_backbone
    from checkerpose_tpu.train.checkpoint import CheckpointManager
    from checkerpose_tpu.train.state import TrainState
    # Existence is checked on the filesystem FIRST: constructing an orbax
    # CheckpointManager at a typo'd path would mkdir the empty tree as a
    # side effect, masking the misconfiguration on later inspection
    # (ADVICE r3). A numbered-step subdir is what a real save leaves behind.
    has_step = os.path.isdir(bk_ck) and any(
        d.isdigit() for d in os.listdir(bk_ck))
    if not has_step:
        msg = (f"backbone_pretrain_checkpoint={bk_ck} has no numbered "
               "checkpoint step")
        if os.environ.get("CHECKERPOSE_REQUIRE_BACKBONE_GRAFT", "0") == "1":
            # Strict mode for runs where the graft is load-bearing (the r4
            # accuracy proof): a silent from-scratch fallback would
            # invalidate a multi-hour experiment without any failure.
            raise FileNotFoundError(
                msg + " and CHECKERPOSE_REQUIRE_BACKBONE_GRAFT=1")
        # Fail soft otherwise: a missing backbone checkpoint must not wedge
        # a segmented driver in a retry loop — train from scratch, loudly.
        print(f"WARNING: {msg}; training the backbone from scratch",
              flush=True)
        return state
    mgr = CheckpointManager(bk_ck)
    if mgr.latest_step() is None:
        if os.environ.get("CHECKERPOSE_REQUIRE_BACKBONE_GRAFT", "0") == "1":
            raise FileNotFoundError(
                f"backbone_pretrain_checkpoint={bk_ck}: orbax found no "
                "restorable step (CHECKERPOSE_REQUIRE_BACKBONE_GRAFT=1)")
        print(f"WARNING: backbone_pretrain_checkpoint={bk_ck} has no "
              "checkpoint; training the backbone from scratch", flush=True)
        return state
    raw = mgr.restore_raw()
    wp, ws = graft_backbone({"m": state.params}, {"m": state.batch_stats},
                            raw["params"]["backbone"],
                            raw["batch_stats"]["backbone"], into="m")
    print(f"grafted NOCS-pretrained backbone from {bk_ck} "
          f"(step {int(raw['step'])})", flush=True)
    return TrainState(params=wp["m"], batch_stats=ws["m"],
                      opt_state=state.opt_state, step=0,
                      best_score=state.best_score)
