"""lm_imgn synthetic-render ingestion (round-2 VERDICT item 8)."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from checkerpose_tpu.data.lm_imgn import scan_lm_imgn, K_LM
from checkerpose_tpu.data.dataset import CropDataset, Loader, MixedLoader
from checkerpose_tpu.data.synthetic import make_synthetic_bop
from checkerpose_tpu.data.bop_io import scan_bop_object


@pytest.fixture(scope="module")
def imgn_root(tmp_path_factory):
    """Miniature lm_imgn layout: imgn/<obj>/{id}-color/depth/pose."""
    root = tmp_path_factory.mktemp("lm_imgn")
    rng = np.random.default_rng(0)
    obj_dir = root / "imgn" / "ape"
    obj_dir.mkdir(parents=True)
    for i in range(7):
        img = rng.integers(0, 255, (480, 640, 3)).astype(np.uint8)
        depth = np.zeros((480, 640), np.uint16)
        x0, y0 = 200 + 10 * i, 150 + 5 * i
        depth[y0:y0 + 80, x0:x0 + 60] = 500
        R = np.eye(3)
        t_m = np.array([0.01, -0.02, 0.45])  # meters in pose files
        pose = np.hstack([R, t_m[:, None]])  # (3,4) [R|t]
        with open(obj_dir / f"{i:06d}-pose.txt", "w") as f:
            f.write("rotation translation\n")
            np.savetxt(f, pose)
        cv2.imwrite(str(obj_dir / f"{i:06d}-color.png"), img)
        cv2.imwrite(str(obj_dir / f"{i:06d}-depth.png"), depth)
    return str(root)


def test_scan_lm_imgn_subsample(imgn_root):
    samples = scan_lm_imgn(imgn_root, "ape", 1, n_per_obj=4)
    assert len(samples) == 4
    # uniform linspace over 7 ids -> 0, 2, 4, 6
    assert [s.im_id for s in samples] == [0, 1, 2, 3]
    assert all(s.depth_path and s.img_type == "syn" for s in samples)
    s = samples[0]
    np.testing.assert_allclose(s.t, [10.0, -20.0, 450.0])  # m -> mm
    assert s.bbox_visib[2] == 60 and s.bbox_visib[3] == 80
    np.testing.assert_array_equal(s.cam_K, K_LM)


def test_imgn_item_masks_from_depth(imgn_root):
    samples = scan_lm_imgn(imgn_root, "ape", 1, n_per_obj=0)
    xyz = np.random.default_rng(1).uniform(-30, 30, (16, 3))
    ds = CropDataset(samples, {1: xyz}, is_train=False)
    item = ds[0]
    assert item["valid"] == 1.0
    assert item["mask_visib"].max() == 1.0  # depth-derived mask present
    np.testing.assert_array_equal(item["mask_visib"], item["mask_full"])


def test_mixed_bop_plus_imgn(imgn_root, tmp_path_factory):
    """Reference LM recipe: BOP-layout real + imgn synthetic mixed per step."""
    bop_root = str(tmp_path_factory.mktemp("bop"))
    make_synthetic_bop(bop_root, n_objects=1, n_scenes=1, n_images=4,
                       folders=("train_real",))
    real = scan_bop_object(bop_root, "synth", "train_real", 1, 0.1)
    syn = scan_lm_imgn(imgn_root, "ape", 1, n_per_obj=0)
    xyz = np.random.default_rng(1).uniform(-30, 30, (16, 3))
    l1 = Loader(CropDataset(real, {1: xyz}, is_train=True), 2,
                shuffle=True, infinite=True)
    l2 = Loader(CropDataset(syn, {1: xyz}, is_train=True), 3,
                shuffle=True, infinite=True)
    b = next(iter(MixedLoader(l1, l2)))
    assert b["image"].shape == (5, 256, 256, 3)
    assert b["valid"].sum() == 5.0


def test_build_train_loaders_lm_imgn_branch(imgn_root, tmp_path_factory):
    """Regression: the cfg-driven path (`training_data_folder_2 = lm_imgn`)
    must actually build the mixed loader -- an early version gathered the
    imgn samples and then fell through without constructing any loader
    (UnboundLocalError at return)."""
    from checkerpose_tpu.cli.common import build_train_loaders_lm
    bop_root = str(tmp_path_factory.mktemp("bop2"))
    make_synthetic_bop(bop_root, n_objects=1, n_scenes=1, n_images=4,
                       folders=("train_real",))
    xyz = np.random.default_rng(1).uniform(-30, 30, (16, 3))
    cfg = {
        "bop_path": bop_root, "dataset_name": "synth",
        "training_data_folder": "train_real",
        "training_data_folder_2": "lm_imgn",
        "lm_imgn_root": imgn_root, "imgn_n_per_obj": 0,
        "second_dataset_ratio": 0.5, "batch_size": 4,
        "obj_ids": [1], "obj_names": ["ape"],
        "train_obj_visible_theshold": 0.1,
    }
    train_loader, val_factory = build_train_loaders_lm(cfg, {1: xyz})
    assert isinstance(train_loader, MixedLoader)
    b = next(iter(train_loader))
    assert b["image"].shape == (4, 256, 256, 3)
    assert b["valid"].sum() == 4.0


def test_syn_always_gets_background(imgn_root, tmp_path):
    bg = tmp_path / "bg.png"
    cv2.imwrite(str(bg), np.full((64, 64, 3), 200, np.uint8))
    samples = scan_lm_imgn(imgn_root, "ape", 1, n_per_obj=0)
    xyz = np.random.default_rng(1).uniform(-30, 30, (16, 3))
    ds = CropDataset(samples, {1: xyz}, is_train=True,
                     bg_paths=[str(bg)], change_bg_prob=0.0)
    item = ds[0]  # change_bg_prob=0 but img_type=syn -> replaced anyway
    # corners of the crop are background (blue-ish 200 constant)
    corner = item["image"][:4, :4]
    assert (np.abs(corner.astype(int) - 200) <= 2).all()
