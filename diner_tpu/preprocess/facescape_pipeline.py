"""FaceScape per-view preprocessing pipeline (orchestration).

Behavioral reference: deps/facescape_preprocessing/process_dataset.py:94-287
in malteprinzler/diner. Per subject/expression/view: undistort the raw image,
render GT mesh depth (software rasterizer replaces pyrender), silhouette
square-crop to `crop_out`, adjust intrinsics, and write the dataset files the
FaceScape loader reads:
  view_XXXXX/{rgba.png, depth.png (uint16 1e-4 m)}, cameras.json.
Rigid canonical alignment (their precomputed per-scan similarity transforms)
is applied to the mesh before calling `process_view`.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from diner_tpu.data.codecs import write_depth_png
from diner_tpu.preprocess.facescape import (
    undistort_image, silhouette_square_crop, crop_intrinsics, composite_rgba)
from diner_tpu.preprocess.rasterizer import render_depth


def apply_similarity(vertices, scale: float, rotation, translation):
    """Rigid/similarity alignment to the canonical head frame (mm -> m etc.,
    process_dataset.py:116-133)."""
    return (np.asarray(vertices) * scale) @ np.asarray(rotation).T \
        + np.asarray(translation)


def process_view(img, K, dist_coeffs, extrinsics, mesh_vertices, mesh_faces,
                 crop_out: int = 256, margin: float = 0.1):
    """One camera view -> (rgba (crop, crop, 4), depth (crop, crop) [m],
    adjusted K (3, 3)).

    img: (H, W, 3) uint8/float; K/dist/extrinsics: OpenCV calibration;
    mesh in the (aligned, metric) world frame."""
    import cv2

    img = np.asarray(img)
    H, W = img.shape[:2]
    und = undistort_image(img, K, dist_coeffs)

    depth_full, mask_full = render_depth(mesh_vertices, mesh_faces, K,
                                         extrinsics, H, W)
    top, left, side = silhouette_square_crop(mask_full, crop_out, margin)

    def crop_resize(a, interp):
        c = a[top:top + side, left:left + side]
        return cv2.resize(c, (crop_out, crop_out), interpolation=interp)

    rgb = crop_resize(und, cv2.INTER_AREA)
    if rgb.dtype == np.uint8:
        rgb = rgb.astype(np.float32) / 255.0
    depth = crop_resize(depth_full, cv2.INTER_NEAREST)
    mask = crop_resize(mask_full.astype(np.uint8), cv2.INTER_NEAREST) > 0

    rgba = composite_rgba(rgb, mask)
    K_out = crop_intrinsics(K, top, left, side, crop_out)
    return rgba, depth, K_out


def write_view(out_dir, view_id: int, rgba, depth_m):
    """Write view_XXXXX/{rgba.png, depth.png} (facescape.py file contract)."""
    import imageio.v2 as imageio

    vdir = Path(out_dir) / f"view_{view_id:05d}"
    vdir.mkdir(parents=True, exist_ok=True)
    imageio.imwrite(vdir / "rgba.png",
                    (np.clip(rgba, 0, 1) * 255).astype(np.uint8))
    write_depth_png(vdir / "depth.png", depth_m)
    return vdir


def write_cameras(out_dir, cams: dict):
    """cams: {view_id: {"extrinsics": (3..4, 4), "intrinsics": (3, 3)}}."""
    ser = {str(k): {"extrinsics": np.asarray(v["extrinsics"])[:3].tolist(),
                    "intrinsics": np.asarray(v["intrinsics"]).tolist()}
           for k, v in cams.items()}
    p = Path(out_dir) / "cameras.json"
    p.write_text(json.dumps(ser, indent="\t"))
    return p
