from checkerpose_tpu.solver.epnp import epnp, refine_pose_gn, rodrigues  # noqa: F401
from checkerpose_tpu.solver.ransac import ransac_pnp, solve_poses_batched  # noqa: F401
