from diner_tpu.image_ops.grid_sample import grid_sample, exponential_pad
from diner_tpu.image_ops.resize import resize_bilinear_align_corners, avg_pool2d
from diner_tpu.image_ops.colormap import colormap
from diner_tpu.image_ops.downsample import masked_downsample

__all__ = [
    "grid_sample",
    "exponential_pad",
    "resize_bilinear_align_corners",
    "avg_pool2d",
    "colormap",
    "masked_downsample",
]
