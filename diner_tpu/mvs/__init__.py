from diner_tpu.mvs.ops import (
    deform_conv2d,
    homo_warping,
    depth_range_samples,
    depth_wta,
)
from diner_tpu.mvs.net import TransMVSNet, window_offset_stats
from diner_tpu.mvs.losses import entropy_loss, mvs_loss

__all__ = [
    "deform_conv2d",
    "homo_warping",
    "depth_range_samples",
    "depth_wta",
    "TransMVSNet",
    "window_offset_stats",
    "entropy_loss",
    "mvs_loss",
]
