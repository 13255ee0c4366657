"""Binary-code codec: pixel index <-> MSB-first binary code.

Semantics match the reference codec
(`checkerpose/binary_code_helper/class_id_encoder_decoder.py:30-101`):
codes are MSB-first, id = sum_i code[i] * 2**(L-1-i).

Everything here is pure jnp with static shapes, usable inside jit and on any
leading batch dims. Base-2 only on the hot path (the reference defaults to
class_base=2 throughout its main pipeline).
"""
from __future__ import annotations

import jax.numpy as jnp


def ids_to_codes(ids: jnp.ndarray, num_bits: int) -> jnp.ndarray:
    """Integer ids (...,) -> MSB-first binary codes (..., num_bits), int32.

    Mirrors `class_id_vec_to_class_code_vecs` (reference
    `class_id_encoder_decoder.py:88-101`) with base 2.
    """
    ids = ids.astype(jnp.int32)
    shifts = (num_bits - 1 - jnp.arange(num_bits, dtype=jnp.int32))
    return (ids[..., None] >> shifts) & 1


def codes_to_ids(codes: jnp.ndarray) -> jnp.ndarray:
    """MSB-first binary codes (..., num_bits) -> integer ids (...,), int32.

    Mirrors `class_code_vecs_to_class_id_vec` (reference
    `class_id_encoder_decoder.py:30-38`) with base 2. Accepts float codes in
    {0., 1.} or int codes.
    """
    num_bits = codes.shape[-1]
    weights = (1 << (num_bits - 1 - jnp.arange(num_bits, dtype=jnp.int32)))
    return jnp.sum(codes.astype(jnp.int32) * weights, axis=-1)


def probs_to_bits(logits: jnp.ndarray) -> jnp.ndarray:
    """Network logits -> hard {0,1} bits via sigmoid > 0.5.

    Mirrors `from_code_prob_to_id`'s thresholding (reference
    `model/pipeline.py:84-92`). sigmoid(x) > 0.5  <=>  x > 0, so we threshold
    logits directly (cheaper, numerically identical).
    """
    return (logits > 0.0).astype(jnp.int32)


def logits_to_ids(logits: jnp.ndarray) -> jnp.ndarray:
    """Logits (..., num_bits) -> integer ids via hard thresholding.

    Equivalent of `from_code_prob_to_id` (reference `model/pipeline.py:84-92`)
    but bits live on the LAST axis here (TPU-friendly layout).
    """
    return codes_to_ids(probs_to_bits(logits))


def logits_to_mask(logits: jnp.ndarray) -> jnp.ndarray:
    """Logits -> float {0.,1.} mask. Equivalent of `from_mask_prob_to_mask`
    (reference `model/pipeline.py:120-127`)."""
    return (logits > 0.0).astype(jnp.float32)
