from checkerpose_tpu.models.init_net import InitNet  # noqa: F401
from checkerpose_tpu.models.posenet import PoseNet  # noqa: F401
from checkerpose_tpu.models.backbone import make_backbone, BACKBONE_FEAT_DIMS  # noqa: F401
