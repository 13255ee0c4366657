from checkerpose_tpu.ops import codes, geometry, crop, augment, knn  # noqa: F401
