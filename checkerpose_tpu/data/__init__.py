from checkerpose_tpu.data.dataset_info import get_obj_info  # noqa: F401
from checkerpose_tpu.data.bop_io import scan_bop_object, Sample  # noqa: F401
from checkerpose_tpu.data.detections import load_detections, attach_detections  # noqa: F401
