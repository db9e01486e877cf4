"""Per-camera affine color calibration.

Behavioral reference: deps/facescape_preprocessing/calibrate_colors.py:31-262
in malteprinzler/diner: optimize a per-camera affine color transform
(3x3 matrix + offset) so mesh-vertex colors agree across views, using
rendered-depth visibility and outlier masking, then write
rgba_colorcalib.png. The mesh-visibility sampling uses our rasterizer; the
optimization is the closed-form least squares below.
"""

from __future__ import annotations

import numpy as np

from diner_tpu.preprocess.rasterizer import render_depth


def fit_affine_color_transform(src_colors, ref_colors, l2: float = 1e-4):
    """Least-squares affine map A (3x4) with src @ A[:,:3].T + A[:,3] ~= ref.

    src_colors/ref_colors: (N, 3) in [0, 1]. Ridge-regularized toward
    identity. Returns (3, 4) float32.
    """
    src = np.asarray(src_colors, np.float64)
    ref = np.asarray(ref_colors, np.float64)
    X = np.concatenate([src, np.ones((len(src), 1))], axis=1)  # (N, 4)
    ident = np.concatenate([np.eye(3), np.zeros((3, 1))], axis=1)  # (3, 4)
    # solve (X^T X + l2 I) A^T = X^T ref + l2 ident^T
    xtx = X.T @ X + l2 * np.eye(4) * max(len(src), 1)
    xty = X.T @ ref + l2 * max(len(src), 1) * ident.T
    A = np.linalg.solve(xtx, xty).T
    return A.astype(np.float32)


def apply_affine_color_transform(img, A):
    """img (H, W, 3) in [0, 1]; A (3, 4). Returns calibrated image in [0, 1]."""
    out = np.asarray(img, np.float32) @ A[:, :3].T + A[:, 3]
    return np.clip(out, 0.0, 1.0)


def vertex_visibility(vertices, faces, K, extrinsics, H, W,
                      depth_tol: float = 5e-3):
    """Which mesh vertices are visible from a camera (z-buffer test).

    Returns (visible (V,) bool, uv (V, 2) pixel coords).
    """
    depth_map, _ = render_depth(vertices, faces, K, extrinsics, H, W)
    cam = np.asarray(vertices) @ np.asarray(extrinsics)[:3, :3].T \
        + np.asarray(extrinsics)[:3, 3]
    z = cam[:, 2]
    uv = cam[:, :2] / np.maximum(z[:, None], 1e-9)
    uv = uv * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    inside = (uv[:, 0] >= 0) & (uv[:, 0] < W) & (uv[:, 1] >= 0) & (uv[:, 1] < H)
    # a vertex on a triangle edge/corner may round to a pixel its own triangle
    # doesn't cover -> accept agreement anywhere in the 3x3 neighborhood
    best = np.full(len(z), np.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ju = np.clip(np.round(uv[:, 0]).astype(int) + dx, 0, W - 1)
            jv = np.clip(np.round(uv[:, 1]).astype(int) + dy, 0, H - 1)
            d = depth_map[jv, ju]
            err = np.where(d > 0, np.abs(d - z), np.inf)
            best = np.minimum(best, err)
    visible = inside & (z > 0) & (best < depth_tol * np.maximum(z, 1))
    return visible, uv


def sample_vertex_colors(img, uv, visible):
    """Nearest-pixel vertex colors from an image; invisible -> NaN."""
    H, W = img.shape[:2]
    ju = np.clip(np.round(uv[:, 0]).astype(int), 0, W - 1)
    jv = np.clip(np.round(uv[:, 1]).astype(int), 0, H - 1)
    cols = np.asarray(img, np.float32)[jv, ju]
    cols[~visible] = np.nan
    return cols


def calibrate_cameras(vertex_colors_per_view):
    """Fit per-view affine transforms toward the cross-view mean.

    vertex_colors_per_view: (Ncam, Nvert, 3) with NaN for invisible vertices.
    Returns list of (3, 4) transforms.
    """
    stack = np.asarray(vertex_colors_per_view, np.float64)
    mean = np.nanmean(stack, axis=0)  # (Nvert, 3)
    out = []
    for v in range(stack.shape[0]):
        valid = ~np.isnan(stack[v]).any(axis=1) & ~np.isnan(mean).any(axis=1)
        if valid.sum() < 16:
            out.append(np.concatenate([np.eye(3), np.zeros((3, 1))],
                                      axis=1).astype(np.float32))
            continue
        out.append(fit_affine_color_transform(stack[v][valid], mean[valid]))
    return out
