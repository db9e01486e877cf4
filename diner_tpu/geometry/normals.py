"""Depth-map -> normal-map conversion via central differences.

Behavioral reference: src/util/depth2normal.py:6-87 in malteprinzler/diner.
Backprojects depth to camera-space points, takes replicate-padded central
differences, normalizes cross(vdiff, hdiff), then repairs normals whose
neighborhood contains invalid (depth==0) pixels by borrowing the normal of the
pixel one step away from the invalid side; normals at invalid pixels are zero.

Deviation from the reference: invalidity of a neighbor is detected via its
*depth* being zero rather than its x-coordinate being zero (the reference's
x==0 test is a proxy for depth==0 that can mis-fire on the principal column).
"""

from __future__ import annotations

import jax.numpy as jnp


def depth2normal(dmap, K):
    """Compute camera-space normal maps from depth maps.

    Args:
      dmap: (B, H, W, 1) metric depth, 0 = invalid.
      K: (B, 3, 3) intrinsics.

    Returns:
      (B, H, W, 3) unit normals (zeros where depth invalid).
    """
    B, H, W, _ = dmap.shape
    dtype = dmap.dtype

    xs = jnp.arange(0.5, W, 1.0, dtype=dtype)
    ys = jnp.arange(0.5, H, 1.0, dtype=dtype)
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W)
    pix = jnp.stack([gx, gy], axis=-1)[None]  # (1, H, W, 2)

    c = K[:, :2, 2][:, None, None]  # (B, 1, 1, 2)
    f = K[:, jnp.array([0, 1]), jnp.array([0, 1])][:, None, None]  # (B, 1, 1, 2)
    rays = (pix - c) / f
    rays = jnp.concatenate([rays, jnp.ones_like(rays[..., :1])], axis=-1)  # (B, H, W, 3)
    pts = rays * dmap  # (B, H, W, 3)

    pad = lambda x: jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    pts_p = pad(pts)
    d_p = pad(dmap)

    down = pts_p[:, 2:, 1:-1]
    up = pts_p[:, :-2, 1:-1]
    right = pts_p[:, 1:-1, 2:]
    left = pts_p[:, 1:-1, :-2]

    vdiff = down - up
    hdiff = right - left
    normal = jnp.cross(vdiff, hdiff)
    norm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.where(norm == 0, 1.0, norm)

    # Repair: shift away from invalid neighbors.
    inv_down = d_p[:, 2:, 1:-1, 0] == 0
    inv_up = d_p[:, :-2, 1:-1, 0] == 0
    inv_right = d_p[:, 1:-1, 2:, 0] == 0
    inv_left = d_p[:, 1:-1, :-2, 0] == 0

    off_y = -inv_down.astype(jnp.int32) + inv_up.astype(jnp.int32)
    off_x = -inv_right.astype(jnp.int32) + inv_left.astype(jnp.int32)

    iy = jnp.arange(H)[None, :, None] + off_y
    ix = jnp.arange(W)[None, None, :] + off_x
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)

    flat = normal.reshape(B, H * W, 3)
    idx = (iy * W + ix).reshape(B, H * W)
    borrowed = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, H, W, 3)

    needs_repair = (off_y != 0) | (off_x != 0)
    normal = jnp.where(needs_repair[..., None], borrowed, normal)
    normal = jnp.where(dmap == 0, 0.0, normal)
    return normal
