from checkerpose_tpu.train.state import TrainState, create_init_state, create_pose_state  # noqa: F401
from checkerpose_tpu.train import steps  # noqa: F401
