"""Camera ray generation (OpenCV pinhole convention).

Behavioral reference: src/util/cam_geometry.py:5-48 (gen_rays) in malteprinzler/diner.
Rays are [origin(3), direction(3, unit-norm), near(1), far(1)]; pixel centers sit at
integer+0.5 screen coordinates; `z` values along a ray therefore measure *distance along
the (unit) ray*, not depth along the optical axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def gen_rays(extrinsics, intrinsics, W: int, H: int, z_near, z_far):
    """Generate per-pixel world-space camera rays.

    Args:
      extrinsics: (B, 4, 4) world->camera transforms (OpenCV convention).
      intrinsics: (B, 3, 3) pinhole K matrices.
      W, H: image width/height (static Python ints).
      z_near, z_far: scalars or (B,) near/far distances along each ray.

    Returns:
      (B, H, W, 8) array: [origin xyz, unit direction xyz, near, far].
    """
    B = extrinsics.shape[0]
    dtype = extrinsics.dtype

    focal = intrinsics[:, jnp.array([0, 1]), jnp.array([0, 1])]  # (B, 2) [fx, fy]
    c = intrinsics[:, :2, 2]  # (B, 2) [cx, cy]

    xs = jnp.arange(0.5, W, 1.0, dtype=dtype)
    ys = jnp.arange(0.5, H, 1.0, dtype=dtype)
    grid_x, grid_y = jnp.meshgrid(xs, ys)  # (H, W) each
    pix = jnp.stack([grid_x, grid_y], axis=-1)  # (H, W, 2) [x, y]

    cam = (pix[None] - c[:, None, None]) / focal[:, None, None]  # (B, H, W, 2)
    cam = jnp.concatenate([cam, jnp.ones_like(cam[..., :1])], axis=-1)  # (B, H, W, 3)
    dirs_cam = cam / jnp.linalg.norm(cam, axis=-1, keepdims=True)

    rot_c2w = jnp.swapaxes(extrinsics[:, :3, :3], -1, -2)  # (B, 3, 3)
    dirs_world = jnp.einsum("bij,bhwj->bhwi", rot_c2w, dirs_cam)  # (B, H, W, 3)

    centers = -jnp.einsum("bij,bj->bi", rot_c2w, extrinsics[:, :3, 3])  # (B, 3)
    origins = jnp.broadcast_to(centers[:, None, None], (B, H, W, 3))

    near = jnp.broadcast_to(jnp.reshape(jnp.asarray(z_near, dtype), (-1, 1, 1, 1)), (B, H, W, 1))
    far = jnp.broadcast_to(jnp.reshape(jnp.asarray(z_far, dtype), (-1, 1, 1, 1)), (B, H, W, 1))

    return jnp.concatenate([origins, dirs_world, near, far], axis=-1)
