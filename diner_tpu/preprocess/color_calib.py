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


def calibrate_pose_dir(pose_dir, mesh_vertices, mesh_faces,
                       out_name: str = "rgba_colorcalib.png"):
    """Color-calibrate one processed pose directory in place.

    Reads `view_XXXXX/rgba.png` + `cameras.json` (the facescape_pipeline
    output layout), computes per-view mesh-vertex visibility with the
    rasterized z-buffer, fits per-view affine transforms toward the
    cross-view mean vertex color (calibrate_colors.py:31-262 contract), and
    writes `view_XXXXX/rgba_colorcalib.png`. Returns {view_id: (3, 4) A}.
    """
    import json
    from pathlib import Path

    import imageio.v2 as imageio

    pose_dir = Path(pose_dir)
    cams = json.loads((pose_dir / "cameras.json").read_text())
    view_ids = sorted(cams, key=int)
    imgs, colors = {}, []
    for i in view_ids:
        img = np.asarray(imageio.imread(
            pose_dir / f"view_{int(i):05d}" / "rgba.png"), np.float32) / 255.0
        K = np.asarray(cams[i]["intrinsics"], np.float32)
        ext = np.asarray(cams[i]["extrinsics"], np.float32)
        H, W = img.shape[:2]
        visible, uv = vertex_visibility(mesh_vertices, mesh_faces, K, ext, H, W)
        colors.append(sample_vertex_colors(img[..., :3], uv, visible))
        imgs[i] = img
    transforms = calibrate_cameras(np.stack(colors))

    out = {}
    for i, A in zip(view_ids, transforms):
        img = imgs[i]
        rgb = apply_affine_color_transform(img[..., :3], A)
        rgba = np.concatenate([np.clip(rgb, 0, 1), img[..., 3:]], axis=-1)
        imageio.imwrite(pose_dir / f"view_{int(i):05d}" / out_name,
                        (rgba * 255).astype(np.uint8))
        out[i] = A
    return out


def main(argv=None):
    import argparse

    from diner_tpu.fusion.ply import read_ply_mesh

    ap = argparse.ArgumentParser(
        description="Per-camera affine color calibration "
                    "(calibrate_colors.py equivalent)")
    ap.add_argument("--pose-dir", required=True,
                    help="processed pose dir (view_XXXXX/ + cameras.json)")
    ap.add_argument("--mesh", required=True, help="aligned scan mesh .ply")
    args = ap.parse_args(argv)
    verts, faces = read_ply_mesh(args.mesh)
    out = calibrate_pose_dir(args.pose_dir, verts, faces)
    print(f"calibrated {len(out)} views in {args.pose_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
