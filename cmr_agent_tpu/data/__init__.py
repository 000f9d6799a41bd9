"""Host data pipelines (KITTI / NuScenes / synthetic).

The reference implements per-sample preprocessing inside torch Dataset
``__getitem__`` with cv2/scipy/open3d dependencies
(dataset/KittiDataset.py:258-423, dataset/NuScenesDataset.py:47-305). Here
the geometry lives in pure-numpy functions (:mod:`pipeline`) shared by all
datasets, with an optional C++ fast path for the two host hot spots (FPS +
1-NN assignment, see :mod:`cmr_agent_tpu.native`). Samples come out in TPU
layouts: NHWC images, channels-last points.
"""

from .pipeline import (  # noqa: F401
    downsample_indices,
    camera_matrix_scaling,
    camera_matrix_cropping,
    angles_to_rotation_matrix,
    random_transform,
    project_and_masks,
    sample_circle_loss_points,
    farthest_point_sample_np,
    nearest_assign_np,
    build_geometry_sample,
    cost_volume_labels,
)
from .kitti import KittiCalib, KittiDataset  # noqa: F401
from .nuscenes import NuScenesDataset  # noqa: F401
from .synthetic import SyntheticDataset, make_synthetic_raw  # noqa: F401
from .loader import DataLoader, collate, shard_batch  # noqa: F401
from .label_mapping import load_label_mapping  # noqa: F401
