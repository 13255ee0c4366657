import numpy as np
import jax.numpy as jnp
import pytest

from checkerpose_tpu.ops import crop

cv2 = pytest.importorskip("cv2")


def _ref_crop_square_resize(img, Bbox, crop_size, interpolation):
    """Reference crop_square_resize math (bop_dataset_pytorch.py:55-91),
    re-derived for golden comparison."""
    x1, bw = Bbox[0], Bbox[2]
    x2 = Bbox[0] + bw
    y1, bh = Bbox[1], Bbox[3]
    y2 = Bbox[1] + bh
    c = np.array([0.5 * (x1 + x2), 0.5 * (y1 + y2)])
    if bh > bw:
        x1, x2 = c[0] - bh / 2, c[0] + bh / 2
    else:
        y1, y2 = c[1] - bw / 2, c[1] + bw / 2
    x1, y1, x2, y2 = int(x1), int(y1), int(x2), int(y2)
    if img.ndim > 2:
        roi = np.zeros((max(bh, bw), max(bh, bw), img.shape[2]), dtype=img.dtype)
    else:
        roi = np.zeros((max(bh, bw), max(bh, bw)), dtype=img.dtype)
    rx1 = max(-x1, 0); x1 = max(x1, 0)
    rx2 = rx1 + min(img.shape[1] - x1, x2 - x1)
    ry1 = max(-y1, 0); y1 = max(y1, 0)
    ry2 = ry1 + min(img.shape[0] - y1, y2 - y1)
    x2 = min(x2, img.shape[1]); y2 = min(y2, img.shape[0])
    roi[ry1:ry2, rx1:rx2] = img[y1:y2, x1:x2].copy()
    return cv2.resize(roi, (crop_size, crop_size), interpolation=interpolation)


@pytest.mark.parametrize("bbox", [
    np.array([30, 40, 80, 60]),
    np.array([-10, -20, 100, 90]),   # out of bounds top-left
    np.array([200, 150, 120, 100]),  # out of bounds bottom-right
])
def test_crop_square_resize_parity(bbox):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(240, 320, 3)).astype(np.uint8)
    ref = _ref_crop_square_resize(img, bbox, 64, cv2.INTER_LINEAR)
    ours = crop.crop_square_resize_np(img, bbox, 64, "linear")
    np.testing.assert_array_equal(ref, ours)

    mask = rng.integers(0, 2, size=(240, 320)).astype(np.uint8) * 255
    refm = _ref_crop_square_resize(mask, bbox, 64, cv2.INTER_NEAREST)
    oursm = crop.crop_square_resize_np(mask, bbox, 64, "nearest")
    np.testing.assert_array_equal(refm, oursm)


def test_device_crop_matches_host_inside_image():
    """Device bilinear crop should match cv2 closely for in-bounds bboxes."""
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, size=(240, 320, 3)).astype(np.float32)
    bbox = np.array([40, 30, 128, 128])
    host = crop.crop_resize_np(img, bbox, 64, "linear")
    dev = np.asarray(crop.crop_bilinear(jnp.asarray(img), jnp.asarray(bbox, jnp.float32), 64))
    assert np.abs(host.astype(np.float64) - dev).max() < 1.0


def test_device_crop_nearest_masks():
    rng = np.random.default_rng(2)
    mask = (rng.integers(0, 2, size=(240, 320)) * 255).astype(np.float32)
    bbox = np.array([40, 30, 128, 128])
    host = crop.crop_resize_np(mask, bbox, 64, "nearest")
    dev = np.asarray(crop.crop_nearest(jnp.asarray(mask), jnp.asarray(bbox, jnp.float32), 64))
    # nearest sampling grids coincide for integer scale factors
    np.testing.assert_array_equal(host, dev)


def test_normalize_image():
    img = jnp.full((4, 4, 3), 255.0)
    out = np.asarray(crop.normalize_image(img))
    np.testing.assert_allclose(out[0, 0], (1.0 - crop.IMAGENET_MEAN) / crop.IMAGENET_STD, rtol=1e-6)
