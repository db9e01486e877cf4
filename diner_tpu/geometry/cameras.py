"""Camera/pose utilities (pure jnp, batched).

Behavioral reference: src/util/cam_geometry.py (to_homogeneous_trafo:118-124,
get_ray_intersections:98-115) in malteprinzler/diner; projection math mirrors
src/models/pixelnerf.py:105-108 (uv normalized so +-1 are the outer pixel edges,
i.e. torch align_corners=False convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def to_homogeneous(trafo):
    """(..., 3, 4) -> (..., 4, 4) by appending [0, 0, 0, 1]."""
    row = jnp.zeros_like(trafo[..., :1, :])
    row = row.at[..., 0, 3].set(1.0)
    return jnp.concatenate([trafo, row], axis=-2)


def invert_pose(extrinsics):
    """Invert rigid world->cam transforms (..., 4, 4) -> cam->world (..., 4, 4)."""
    rot = jnp.swapaxes(extrinsics[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", rot, extrinsics[..., :3, 3])
    top = jnp.concatenate([rot, t[..., :, None]], axis=-1)
    return to_homogeneous(top)


def camera_center(extrinsics):
    """World-space camera center of world->cam extrinsics (..., 4, 4) -> (..., 3)."""
    rot = jnp.swapaxes(extrinsics[..., :3, :3], -1, -2)
    return -jnp.einsum("...ij,...j->...i", rot, extrinsics[..., :3, 3])


def transform_points(pose, xyz):
    """Apply rigid transforms to points.

    pose: (..., 4, 4) (or (..., 3, 4)); xyz: (..., N, 3) with broadcastable batch dims.
    Returns (..., N, 3).
    """
    rot = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", rot, xyz) + t[..., None, :]


def project_points(xyz_cam, focal, c, image_shape):
    """Pinhole projection of camera-space points to normalized uv in [-1, 1].

    +-1 correspond to the *outer edges* of the border pixels (align_corners=False).

    Args:
      xyz_cam: (..., N, 3) camera-space points.
      focal: (..., 2) [fx, fy]; c: (..., 2) [cx, cy].
      image_shape: (W, H) ints or array.

    Returns:
      uv: (..., N, 2) normalized coordinates.
    """
    wh = jnp.asarray(image_shape, dtype=xyz_cam.dtype)
    uv = xyz_cam[..., :2] / xyz_cam[..., 2:3]
    uv = uv * focal[..., None, :] + c[..., None, :]
    return uv / wh * 2.0 - 1.0


def ray_closest_points(ray1, ray2):
    """Points on two rays where they come closest (least-squares).

    ray: (6,) [origin xyz, direction xyz]. Returns (x1, x2), each (3,).
    """
    b = (ray2[:3] - ray1[:3])[:, None]  # (3, 1)
    a = jnp.stack([ray1[3:], -ray2[3:]], axis=-1)  # (3, 2)
    t, *_ = jnp.linalg.lstsq(a, b)
    t = t.flatten()
    return ray1[:3] + ray1[3:] * t[0], ray2[:3] + ray2[3:] * t[1]
