from d3ga_tpu.ops.quaternion import (  # noqa: F401
    quat_normalize,
    quat_to_matrix,
    matrix_to_quat,
    quat_multiply,
    axis_angle_to_matrix,
)
from d3ga_tpu.ops.covariance import (  # noqa: F401
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    strip_symmetric,
    unstrip_symmetric,
    inverse_sigmoid,
)
from d3ga_tpu.ops.sh import eval_sh, rgb_to_sh, sh_to_rgb, sh_basis, rotate_sh  # noqa: F401
from d3ga_tpu.ops.posenc import positional_encoding, posenc_dim  # noqa: F401
from d3ga_tpu.ops.knn import knn_mean_sq_dist  # noqa: F401
