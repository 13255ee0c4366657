"""Synthetic BOP dataset fixture.

Generates a tiny but complete BOP-layout dataset on disk (scenes, masks, GT
jsons, models + models_info, FPS keypoints, detection results) so that the
train/test entry points and the eval harness run end-to-end without the real
BOP data (which is not shipped). This implements the test strategy SURVEY.md
§4 prescribes (the reference has no such fixture -- or any tests).

Objects are convex polyhedra (noisy icospheres); images are the filled
projected hull with flat shading on a textured background. Analytic GT: mask =
filled hull, bbox from mask, depth-based visibility is approximated as full
visibility (single object per scene here).
"""
from __future__ import annotations

import json
import os
import pickle

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from checkerpose_tpu.data.ply import save_ply_vertices

K_DEFAULT = np.array([[572.4114, 0.0, 325.2611],
                      [0.0, 573.57043, 242.04899],
                      [0.0, 0.0, 1.0]])
IM_W, IM_H = 640, 480


def _make_object(rng, radius=40.0, n=64, lumpiness=0.25):
    """Noisy convex blob: points on a sphere with radial jitter. Higher
    `lumpiness` gives a less spherical silhouette (stronger shape cues for
    orientation; a near-sphere is only orientable by its texture)."""
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # low-frequency radial field (smooth lumps) + per-vertex jitter
    basis = rng.standard_normal((3, 3))
    field = np.tanh(v @ basis).sum(axis=1) / 3.0
    r = radius * (1.0 + lumpiness * field + 0.15 * rng.random(n))
    return v * r[:, None]


def _random_rotation(rng):
    A = rng.standard_normal((3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def _vertex_colors(n, rng, verts=None):
    """Distinct, stable per-vertex colors (orientation-dependent appearance:
    the pose is readable from WHICH colors are where, making keypoint
    localization learnable -- flat shading alone leaves the orientation
    unobservable and code training stuck at chance).

    The dominant signal is a COORDINATE ramp (NOCS-style: RGB tracks the
    object-frame xyz of each vertex), so correspondences are *locally*
    decodable from appearance -- like the textured objects of the real BOP
    sets. Two earlier textures stalled x/y code training at ln2: pure
    color-identity (scrambled by the reference aug chain's per-channel
    Multiply/Invert, ops/augment.py) and random-gray identity (required
    memorizing per-vertex gray levels; signal too weak under augmentation).
    Per-channel aug ops preserve spatial gradients within each channel, so
    the coordinate ramp survives augmentation. A small gray jitter adds
    high-frequency texture without drowning the ramp."""
    if verts is None:
        gray = rng.integers(30, 256, (n, 1))
        return np.repeat(gray, 3, axis=1).astype(np.int64)
    lo, hi = verts.min(0), verts.max(0)
    ramp = 40.0 + 175.0 * (verts - lo) / (hi - lo + 1e-9)
    jitter = rng.integers(-15, 16, (n, 1))
    return np.clip(ramp.astype(np.int64) + jitter, 0, 255)


def _render(verts, R, t, K, rng, vert_colors):
    cam = verts @ R.T + t[None]
    uvf = cam @ K.T
    uv = (uvf[:, :2] / uvf[:, 2:3]).astype(np.int32)
    depth = cam[:, 2]
    img = (rng.integers(40, 200, (IM_H, IM_W, 3))).astype(np.uint8)
    img[:, ::7] = img[:, ::7] // 2
    mask = np.zeros((IM_H, IM_W), np.uint8)
    hull = cv2.convexHull(uv)
    cv2.fillConvexPoly(mask, hull, 255)
    # object layer: splat vertices far-to-near with their unique colors
    # (splat radius shrinks with vertex density so dense meshes keep a
    # fine-grained, orientation-readable texture)
    obj = np.full((IM_H, IM_W, 3), 90, np.uint8)
    order = np.argsort(-depth)
    rad = max(int(12 * 400.0 / float(depth.mean()) * (64.0 / len(verts)) ** 0.5), 2)
    for i in order:
        c = vert_colors[i]
        cv2.circle(obj, (int(uv[i, 0]), int(uv[i, 1])), rad,
                   (int(c[0]), int(c[1]), int(c[2])), -1)
    fg = mask > 0
    img[fg] = obj[fg]
    return img, mask


def make_synthetic_bop(root: str, dataset: str = "synth", n_objects: int = 2,
                       n_scenes: int = 2, n_images: int = 8, seed: int = 0,
                       folders=("train_real", "train_pbr", "test"),
                       n_vertices: int = 64, raw_cache: bool = False,
                       write_png: bool = True, progress: bool = False):
    """Write a complete miniature BOP dataset under `<root>/<dataset>`.

    Returns the dataset directory. Layout matches what scan_bop_object /
    load_detections / load_fps_points expect.

    Scale knobs (used by the round-2 accuracy-proof run):
      * `folders` may be a dict {folder: n_images} for per-split sizes.
      * `n_vertices`: mesh density; >=1024 supports npt=512 FPS keypoints.
      * `raw_cache=True`: also write a pre-decoded `data.framestore` cache
        under `<ds_dir>/frame_cache` (skips PNG decode at train time).
      * `write_png=False`: skip PNG encode entirely (cache-only training);
        GT jsons and detections are still written, so manifests scan fine.
    """
    assert cv2 is not None, "synthetic fixture requires cv2"
    rng = np.random.default_rng(seed)
    ds_dir = os.path.join(root, dataset)
    models_dir = os.path.join(ds_dir, "models")
    os.makedirs(models_dir, exist_ok=True)
    if not isinstance(folders, dict):
        folders = {f: n_images for f in folders}
    writer = None
    if raw_cache:
        from checkerpose_tpu.data.framestore import FrameCacheWriter
        total = sum(folders.values()) * n_scenes
        writer = FrameCacheWriter(os.path.join(ds_dir, "frame_cache"),
                                  (IM_H, IM_W), total, total)

    # objects + models_info + fps keypoints (meshes get convex-hull faces so
    # the depth renderer / VSD can consume them)
    models_info = {}
    objects = {}
    faces = {}
    fps_dir = os.path.join(ds_dir, "fps_202212")
    os.makedirs(fps_dir, exist_ok=True)
    from checkerpose_tpu.ops.geometry import farthest_point_sample
    try:
        from scipy.spatial import ConvexHull
    except Exception:  # pragma: no cover
        ConvexHull = None
    for obj_id in range(1, n_objects + 1):
        verts = _make_object(rng, n=n_vertices)
        objects[obj_id] = verts
        faces[obj_id] = (ConvexHull(verts).simplices.astype(np.int32)
                         if ConvexHull is not None else None)
        save_ply_vertices(os.path.join(models_dir, f"obj_{obj_id:06d}.ply"),
                          verts, faces[obj_id])
        d = np.linalg.norm(verts[:, None] - verts[None], axis=-1).max()
        models_info[str(obj_id)] = {
            "diameter": float(d),
            "min_x": float(verts[:, 0].min()), "max_x": float(verts[:, 0].max()),
            "min_y": float(verts[:, 1].min()), "max_y": float(verts[:, 1].max()),
            "min_z": float(verts[:, 2].min()), "max_z": float(verts[:, 2].max()),
        }
        npt = min(512, len(verts))
        idx = farthest_point_sample(verts, npt)
        with open(os.path.join(fps_dir, f"obj_{obj_id:06d}.pkl"), "wb") as f:
            pickle.dump({"npoint": npt, "id": idx, "xyz": verts[idx]}, f)
    with open(os.path.join(models_dir, "models_info.json"), "w") as f:
        json.dump(models_info, f)
    # models_eval = same models (fine at this scale)
    eval_dir = os.path.join(ds_dir, "models_eval")
    os.makedirs(eval_dir, exist_ok=True)
    for obj_id in range(1, n_objects + 1):
        save_ply_vertices(os.path.join(eval_dir, f"obj_{obj_id:06d}.ply"),
                          objects[obj_id], faces[obj_id])
    with open(os.path.join(eval_dir, "models_info.json"), "w") as f:
        json.dump(models_info, f)
    with open(os.path.join(ds_dir, "camera.json"), "w") as f:
        json.dump({"cx": K_DEFAULT[0, 2], "cy": K_DEFAULT[1, 2],
                   "fx": K_DEFAULT[0, 0], "fy": K_DEFAULT[1, 1],
                   "width": IM_W, "height": IM_H, "depth_scale": 1.0}, f)

    vert_colors = {obj_id: _vertex_colors(len(objects[obj_id]), rng,
                                          verts=objects[obj_id])
                   for obj_id in objects}
    detections = {}
    targets = []
    for folder, n_im in folders.items():
        for scene_id in range(n_scenes):
            scene_dir = os.path.join(ds_dir, folder, f"{scene_id:06d}")
            for sub in ("rgb", "mask", "mask_visib"):
                os.makedirs(os.path.join(scene_dir, sub), exist_ok=True)
            scene_camera, scene_gt, scene_gt_info = {}, {}, {}
            for im_id in range(n_im):
                obj_id = (im_id % n_objects) + 1
                verts = objects[obj_id]
                R = _random_rotation(rng)
                t = np.array([rng.uniform(-60, 60), rng.uniform(-40, 40),
                              rng.uniform(350, 550)])
                img, mask = _render(verts, R, t, K_DEFAULT, rng, vert_colors[obj_id])
                ys, xs = np.nonzero(mask)
                bbox = [int(xs.min()), int(ys.min()),
                        int(xs.max() - xs.min() + 1), int(ys.max() - ys.min() + 1)]
                rgb_p = os.path.join(scene_dir, "rgb", f"{im_id:06d}.png")
                mask_p = os.path.join(scene_dir, "mask", f"{im_id:06d}_000000.png")
                maskv_p = os.path.join(scene_dir, "mask_visib", f"{im_id:06d}_000000.png")
                if write_png:
                    cv2.imwrite(rgb_p, img)
                    cv2.imwrite(mask_p, mask)
                    cv2.imwrite(maskv_p, mask)
                if writer is not None:
                    # imwrite treats `img` as BGR; imread+[::-1] yields RGB,
                    # so the cache stores the flipped view for parity
                    writer.add_frame(rgb_p, img[:, :, ::-1])
                    writer.add_mask(mask_p, mask)
                    writer.alias_mask(maskv_p, mask_p)
                if progress and (im_id + 1) % 500 == 0:
                    print(f"  {folder}/{scene_id}: {im_id + 1}/{n_im}", flush=True)
                scene_camera[str(im_id)] = {"cam_K": K_DEFAULT.reshape(-1).tolist(),
                                            "depth_scale": 1.0}
                scene_gt[str(im_id)] = [{
                    "obj_id": obj_id,
                    "cam_R_m2c": R.reshape(-1).tolist(),
                    "cam_t_m2c": t.tolist(),
                }]
                scene_gt_info[str(im_id)] = [{
                    "bbox_obj": bbox, "bbox_visib": bbox,
                    "px_count_all": int(mask.sum() // 255),
                    "px_count_visib": int(mask.sum() // 255),
                    "visib_fract": 1.0,
                }]
                if folder == "test":
                    # mesh-rendered depth image (VSD scoring needs scene depth)
                    if faces[obj_id] is not None:
                        from checkerpose_tpu.eval.renderer import render_depth
                        os.makedirs(os.path.join(scene_dir, "depth"), exist_ok=True)
                        dep = render_depth(verts, faces[obj_id], R, t, K_DEFAULT,
                                           IM_W, IM_H)
                        cv2.imwrite(os.path.join(scene_dir, "depth",
                                                 f"{im_id:06d}.png"),
                                    np.clip(dep, 0, 65535).astype(np.uint16))
                    # jittered detector boxes, one slightly-worse duplicate
                    jit = rng.integers(-6, 7, 4)
                    det_bbox = [int(bbox[0] + jit[0]), int(bbox[1] + jit[1]),
                                int(bbox[2] + jit[2]), int(bbox[3] + jit[3])]
                    detections[f"{scene_id}/{im_id}"] = [
                        {"obj_id": obj_id, "bbox_est": det_bbox, "score": 0.9,
                         "time": 0.05},
                        {"obj_id": obj_id, "bbox_est": bbox, "score": 0.5,
                         "time": 0.05},
                    ]
                    targets.append({"im_id": im_id, "inst_count": 1,
                                    "obj_id": obj_id, "scene_id": scene_id})
            for name, payload in (("scene_camera.json", scene_camera),
                                  ("scene_gt.json", scene_gt),
                                  ("scene_gt_info.json", scene_gt_info)):
                with open(os.path.join(scene_dir, name), "w") as f:
                    json.dump(payload, f)

    if writer is not None:
        writer.finalize()
    det_dir = os.path.join(root, "detection_results", dataset)
    os.makedirs(det_dir, exist_ok=True)
    with open(os.path.join(det_dir, "synth_detections.json"), "w") as f:
        json.dump(detections, f)
    with open(os.path.join(ds_dir, "test_targets_bop19.json"), "w") as f:
        json.dump(targets, f)
    return ds_dir
