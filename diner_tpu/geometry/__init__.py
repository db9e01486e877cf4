from diner_tpu.geometry.rays import gen_rays
from diner_tpu.geometry.cameras import (
    to_homogeneous,
    invert_pose,
    transform_points,
    project_points,
    camera_center,
    ray_closest_points,
)
from diner_tpu.geometry.normals import depth2normal
from diner_tpu.geometry.slerp import PoseSlerp

__all__ = [
    "gen_rays",
    "to_homogeneous",
    "invert_pose",
    "transform_points",
    "project_points",
    "camera_center",
    "ray_closest_points",
    "depth2normal",
    "PoseSlerp",
]
