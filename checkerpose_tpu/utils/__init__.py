from checkerpose_tpu.utils.logging import MetricWriter  # noqa: F401
