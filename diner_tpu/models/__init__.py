from diner_tpu.models.pixelnerf import (
    PixelNeRF,
    index_latent,
    index_depth,
    index_depth_std,
    index_normal,
)

__all__ = [
    "PixelNeRF",
    "index_latent",
    "index_depth",
    "index_depth_std",
    "index_normal",
]
