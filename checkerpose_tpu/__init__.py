"""checkerpose_tpu — a TPU-native 6-DoF object-pose estimation framework.

A ground-up JAX/Flax/XLA/Pallas re-design with the capabilities of
CheckerPose (ICCV 2023, arXiv:2303.16874; reference implementation studied at
/root/reference): dense-keypoint binary-code localization, progressive graph
refinement, and on-device RANSAC-PnP pose solving.

Design principles (TPU-first, not a port):
  * NHWC layouts, bfloat16 compute with float32 params/statistics.
  * Static shapes everywhere; progressive stages are static-argnum variants.
  * Label generation, augmentation, decoding, PnP and metrics run on device
    as batched jitted functions -- no per-image host round trips.
  * Data parallelism via jax.sharding.Mesh + NamedSharding; BN is
    cross-replica via axis_name. A `model` mesh axis is plumbed but unused
    at this model scale.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("CHECKERPOSE_PLATFORM"):
    # Force the JAX backend (e.g. "cpu" to drive CLIs while the TPU is busy
    # training). The plain JAX_PLATFORMS env var is overridden by site hooks
    # on some images, so this must go through jax.config before backend init.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["CHECKERPOSE_PLATFORM"])
