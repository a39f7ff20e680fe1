from d3ga_tpu.body.lbs import (  # noqa: F401
    MomentumSkeleton,
    euler_xyz_to_quat,
    solve_skeleton_states,
    states_to_matrices,
    skin_points,
    unskin_points,
)
from d3ga_tpu.body.smplx import SmplxModel, smplx_lbs  # noqa: F401
