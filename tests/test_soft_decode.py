"""Soft (expected-id) decode: eval/decode.py::soft_ids + harness plumbing."""
import numpy as np
import jax.numpy as jnp

from checkerpose_tpu.eval.decode import ids_to_correspondences, soft_ids
from checkerpose_tpu.ops import codes as _codes


def test_soft_equals_hard_when_confident():
    ids = jnp.asarray([[5, 63, 0, 42]], jnp.int32)
    bits = _codes.ids_to_codes(ids, 6)                     # (1, 4, 6) in {0,1}
    logits = (bits * 2.0 - 1.0) * 20.0                     # +-20 -> sigmoid ~ 0/1
    ex, ey = soft_ids(logits, logits)
    np.testing.assert_allclose(np.asarray(ex), np.asarray(ids), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ey), np.asarray(ids), atol=1e-4)


def test_soft_centers_uncertain_tail():
    # MSBs confident for id 40 = 101000b, last two bits logit 0 -> expected
    # id = 40 (confident prefix) + 0.5 + 0.25 + ... over uncertain bits
    bits = _codes.ids_to_codes(jnp.asarray([[40]], jnp.int32), 6)
    logits = np.array((bits * 2.0 - 1.0) * 20.0)
    logits[..., 4:] = 0.0                                  # last 2 bits unknown
    ex, _ = soft_ids(jnp.asarray(logits), jnp.asarray(logits))
    # uniform over the 4-cell block {40..43}: E = 40 + 0.5*2 + 0.5*1 = 41.5
    np.testing.assert_allclose(np.asarray(ex), [[41.5]], atol=1e-3)


def test_adaptive_ids_truncates_uncertain_bits():
    from checkerpose_tpu.eval.decode import adaptive_ids
    bits = _codes.ids_to_codes(jnp.asarray([[40, 7]], jnp.int32), 6)
    logits = np.array((bits * 2.0 - 1.0) * 20.0)
    logits[0, 0, 4:] = -1.0       # last 2 bits of kp0 below tau -> centered
    ex, ey = adaptive_ids(jnp.asarray(logits), jnp.asarray(logits), tau=3.0)
    # kp0: confident prefix 40, uncertain tail centered -> 40 + 1.5
    # kp1: all bits confident -> exact hard id
    np.testing.assert_allclose(np.asarray(ex), [[41.5, 7.0]], atol=1e-3)
    np.testing.assert_allclose(np.asarray(ey), [[41.5, 7.0]], atol=1e-3)
    # tau below the weak logits -> trusts them -> hard id exactly
    ex2, _ = adaptive_ids(jnp.asarray(logits), jnp.asarray(logits), tau=0.5)
    np.testing.assert_allclose(np.asarray(ex2), [[40.0, 7.0]], atol=1e-3)


def test_filter_ids_split_from_coordinate_ids():
    """Centered (soft/adaptive) coordinates can land OFF the seg mask even
    when the net's finest-cell claim is on it; validity must be judged at the
    hard ids (filter_x_id/filter_y_id), not the centered floats. Regression:
    the visib filter collapsed adaptive-decode ADD 0.41 -> 0.03."""
    # seg on only at cell (x=10, y=3); centered coord decodes to x=12.5
    seg = jnp.zeros((1, 64, 64)).at[0, 3, 10].set(1.0)
    ex = jnp.asarray([[12.5]], jnp.float32)   # centered: off-seg cell 12
    ey = jnp.asarray([[3.0]], jnp.float32)
    hard_x = jnp.asarray([[10]], jnp.int32)   # net's claim: on-seg
    hard_y = jnp.asarray([[3]], jnp.int32)
    roi = jnp.ones((1, 1), jnp.float32)
    bbox = jnp.asarray([[0.0, 0.0, 64.0, 64.0]])
    _, v_nofilter = ids_to_correspondences(ex, ey, roi, bbox, crop_size_gt=64,
                                           seg_mask=seg, check_seg=True)
    p2d, v_split = ids_to_correspondences(ex, ey, roi, bbox, crop_size_gt=64,
                                          seg_mask=seg, check_seg=True,
                                          filter_x_id=hard_x, filter_y_id=hard_y)
    assert float(v_nofilter[0, 0]) == 0.0
    assert float(v_split[0, 0]) == 1.0
    # coordinates still come from the centered floats
    np.testing.assert_allclose(np.asarray(p2d[0, 0]), [12.5, 3.0], rtol=1e-6)


def test_float_ids_through_correspondences():
    ex = jnp.asarray([[10.5, 41.5]], jnp.float32)
    ey = jnp.asarray([[3.25, 60.0]], jnp.float32)
    roi = jnp.ones((1, 2), jnp.float32)
    bbox = jnp.asarray([[100.0, 50.0, 128.0, 128.0]])
    seg = jnp.ones((1, 64, 64), jnp.float32)
    p2d, valid = ids_to_correspondences(ex, ey, roi, bbox, crop_size_gt=64,
                                        seg_mask=seg, check_seg=True)
    scale = 128.0 / 64
    np.testing.assert_allclose(np.asarray(p2d[0, 0]),
                               [100.0 + 10.5 * scale, 50.0 + 3.25 * scale],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(valid), [[1.0, 1.0]])
