from diner_tpu.preprocess.rasterizer import render_depth
from diner_tpu.preprocess.facescape import undistort_image, silhouette_square_crop

__all__ = ["render_depth", "undistort_image", "silhouette_square_crop"]
