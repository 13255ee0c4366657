from checkerpose_tpu.eval import metrics, decode  # noqa: F401
