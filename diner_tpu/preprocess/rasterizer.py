"""Software triangle-mesh depth rasterizer (z-buffer, OpenCV pinhole).

Behavioral reference: the reference renders GT depth maps and foreground
masks from meshes with pyrender (deps/facescape_preprocessing/renderer.py:66-92
`render_cvcam`, deps/multiface/process_dataset.py:50-110). pyrender/OpenGL is
not available here; this is a self-contained numpy z-buffer rasterizer with
the same camera convention (world->cam extrinsics, +z forward, y down) used
by the offline preprocessing pipelines. Offline tool — not on the jit path.
"""

from __future__ import annotations

import numpy as np


def render_depth(vertices, faces, K, extrinsics, H: int, W: int,
                 near: float = 1e-4):
    """Z-buffer depth render.

    vertices: (V, 3) world-space; faces: (F, 3) int; K: (3, 3);
    extrinsics: (4, 4) world->cam.
    Returns (depth (H, W) float32 with 0 = no hit, mask (H, W) bool).
    """
    vertices = np.asarray(vertices, np.float64)
    faces = np.asarray(faces, np.int64)
    cam = vertices @ np.asarray(extrinsics, np.float64)[:3, :3].T \
        + np.asarray(extrinsics, np.float64)[:3, 3]
    z = cam[:, 2]
    uv = cam[:, :2] / np.maximum(z[:, None], near)
    uv = uv * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])

    depth = np.full((H, W), np.inf, np.float64)

    tri_uv = uv[faces]      # (F, 3, 2)
    tri_z = z[faces]        # (F, 3)
    valid = (tri_z > near).all(axis=1)

    # conservative screen-space bbox culling
    mins = np.floor(tri_uv.min(axis=1)).astype(np.int64)
    maxs = np.ceil(tri_uv.max(axis=1)).astype(np.int64)
    valid &= (maxs[:, 0] >= 0) & (maxs[:, 1] >= 0)
    valid &= (mins[:, 0] < W) & (mins[:, 1] < H)

    for f in np.nonzero(valid)[0]:
        (x0, y0), (x1, y1) = np.maximum(mins[f], 0), np.minimum(
            maxs[f], [W - 1, H - 1])
        if x1 < x0 or y1 < y0:
            continue
        xs = np.arange(x0, x1 + 1) + 0.5
        ys = np.arange(y0, y1 + 1) + 0.5
        gx, gy = np.meshgrid(xs, ys)
        a, b, c = tri_uv[f]
        # barycentric via edge functions
        den = (b[1] - c[1]) * (a[0] - c[0]) + (c[0] - b[0]) * (a[1] - c[1])
        if abs(den) < 1e-12:
            continue
        w0 = ((b[1] - c[1]) * (gx - c[0]) + (c[0] - b[0]) * (gy - c[1])) / den
        w1 = ((c[1] - a[1]) * (gx - c[0]) + (a[0] - c[0]) * (gy - c[1])) / den
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # perspective-correct depth: interpolate 1/z
        zi = 1.0 / (w0 / tri_z[f, 0] + w1 / tri_z[f, 1] + w2 / tri_z[f, 2])
        patch = depth[y0:y1 + 1, x0:x1 + 1]
        upd = inside & (zi < patch)
        patch[upd] = zi[upd]

    mask = np.isfinite(depth)
    out = np.where(mask, depth, 0.0).astype(np.float32)
    return out, mask
