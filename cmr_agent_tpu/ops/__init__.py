"""Core array ops for the TPU rebuild.

Everything the reference delegates to native third-party kernels
(torch_scatter CUDA ops, scipy cKDTree, scipy Rotation, numpy FPS loops)
is provided here as XLA-compilable JAX ops, with Pallas fusions for the
hot paths in :mod:`cmr_agent_tpu.ops.pallas_kernels`.
"""

from .scatter import (  # noqa: F401
    segment_sum,
    segment_max,
    segment_mean,
    segment_softmax_attend,
    batched_segment_softmax_attend,
    batched_segment_sum,
    batched_segment_max,
    batched_segment_mean,
    scatter_mean_image,
)
from .geometry import (  # noqa: F401
    euler_xyz_extrinsic_to_matrix,
    matrix_to_euler_xyz_extrinsic,
    matrix_to_euler_intrinsic_xyz_degrees,
    axis_angle_rotation,
    euler_angles_to_matrix_xyz,
    angle2matrix_sxyz,
    make_se3,
    se3_inverse,
    transform_points,
    transform_points_disentangled,
    project_points,
    frustum_mask,
    to_disentangled,
    pose_diff,
)
from .sampling import (  # noqa: F401
    farthest_point_sample,
    nearest_assign,
    knn_indices,
    square_distance,
    index_points,
    query_ball_point,
    random_downsample_indices,
)
from .losses import (  # noqa: F401
    focal_loss,
    circle_loss,
    lovasz_hinge,
    lovasz_softmax,
    softmax_cross_entropy,
)
from .pe import (  # noqa: F401
    sinusoid_table_1d,
    position_encoding_sine_2d,
)
