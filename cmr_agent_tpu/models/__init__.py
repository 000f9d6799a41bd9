"""Flax model zoo for the TPU rebuild.

Layout conventions (TPU-first, unlike the reference's NCHW / [B,C,N]):
images are NHWC ``[B, H, W, C]``; point features are channels-last
``[B, N, C]``. All 1x1 Conv1d stacks of the reference become Dense layers
(identical math, MXU-shaped).
"""

from .layers import (  # noqa: F401
    torch_kernel_init,
    DenseBNLeaky,
    MiniPointNet,
    ResDenseBlock,
    ResidualBlock2D,
    ViTAttention,
    ViTMlp,
    ViTBlock,
    ViTCrossBlock,
)
from .image_encoder import MiniResNet, ImageTransformer  # noqa: F401
from .point_encoder import (  # noqa: F401
    GroupPointTransformer, KnnPointTransformer, PointTransformer,
)
from .linear_attention import LinearAttention  # noqa: F401
from .fusion import IMGPCEncoder, IMGPCEnDecoder  # noqa: F401
from .heads import OverlapDetectionHead, GeometricDistanceHead  # noqa: F401
from .multi_head import MultiHeadModel  # noqa: F401
from .agent import CMRAgent, action_from_logits, action_logprob_and_entropy  # noqa: F401
from .cost_volume import IterModel, decode_topk_yaw_poses  # noqa: F401
from .pointnet import (  # noqa: F401
    sample_and_group, sample_and_group_all,
    PointNetSetAbstraction, PointNetSetAbstractionMsg, PointNetFeaturePropagation,
)
from .gnn import MiniGNN, SiameseResMLP  # noqa: F401
