"""Depth-prior writing: run MVS inference and write the uint16 PNG contract.

Behavioral reference: deps/TransMVSNet/train.py:152-191 (write_prediction
mode) in malteprinzler/diner — the bridge between the MVS subsystem and the
DINER datasets: for every sample, write
  <depthstem>_TransMVSNet.png       (uint16, 1e-4 m units, depth / `scale`)
  <depthstem>_TransMVSNet_conf.png  (confidence, same encoding)
  <depthstem>_TransMVSNet_vis.png   (8-bit preview)
next to the dataset-provided depth path, optionally zeroing via the GT mask.
DTU uses scale = 872/0.7 (the TransMVSNet training scale, train.py:170).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from diner_tpu.data.codecs import DEPTH_SCALE_FACTOR


def write_depth_prediction(depth, confidence, dpath, suffix: str = "TransMVSNet",
                           scale: float = 1.0, mask=None):
    """depth/confidence: (H, W) float arrays; dpath: the dataset's GT depth
    path whose stem anchors the output names."""
    import imageio.v2 as imageio

    dpath = Path(dpath)
    depth = np.asarray(depth, np.float64) / scale
    conf = np.asarray(confidence, np.float64)
    if mask is not None:
        depth = depth * (np.asarray(mask) > 0)
        conf = conf * (np.asarray(mask) > 0)

    stem = dpath.stem
    out = dpath.parent
    out.mkdir(parents=True, exist_ok=True)
    q = np.clip(depth / DEPTH_SCALE_FACTOR, 0, np.iinfo(np.uint16).max)
    imageio.imwrite(out / f"{stem}_{suffix}.png", q.astype(np.uint16))
    qc = np.clip(conf / DEPTH_SCALE_FACTOR, 0, np.iinfo(np.uint16).max)
    imageio.imwrite(out / f"{stem}_{suffix}_conf.png", qc.astype(np.uint16))
    vis = depth - depth[depth > 0].min() if (depth > 0).any() else depth
    vmax = vis.max() if vis.max() > 0 else 1.0
    imageio.imwrite(out / f"{stem}_{suffix}_vis.png",
                    (np.clip(vis / vmax, 0, 1) * 255).astype(np.uint8))
    return out / f"{stem}_{suffix}.png"


def make_proj_matrices(extrinsics, intrinsics):
    """Build the per-stage [extrinsics, intrinsics] stacks the cascade expects.

    extrinsics: (B, V, 4, 4); intrinsics: (B, V, 3, 3) at FULL resolution.
    Returns dict stage1..3 of (B, V, 2, 4, 4) with intrinsics scaled by
    1/4, 1/2, 1 (dtu_yao.py:170-201 convention).
    """
    B, V = extrinsics.shape[:2]
    out = {}
    for stage, scale in (("stage1", 4.0), ("stage2", 2.0), ("stage3", 1.0)):
        K4 = np.tile(np.eye(4, dtype=np.float32), (B, V, 1, 1))
        K = np.asarray(intrinsics, np.float32).copy()
        K[..., :2, :] /= scale
        K4[..., :3, :3] = K
        stack = np.stack([np.asarray(extrinsics, np.float32), K4], axis=2)
        out[stage] = stack  # (B, V, 2, 4, 4)
    return out


def save_scene_depth_pfm(depth, stage_confidences, out_dir, view_idx: int):
    """Eval-time PFM outputs with multi-stage confidence product.

    Behavioral reference: deps/TransMVSNet/test.py:136-218 (save_scene_depth):
    writes depth_est/<view>.pfm and confidence/<view>.pfm where the confidence
    is the product of the per-stage photometric confidences upsampled to full
    resolution (test.py:176-179).
    """
    from diner_tpu.data.codecs import write_pfm

    out_dir = Path(out_dir)
    (out_dir / "depth_est").mkdir(parents=True, exist_ok=True)
    (out_dir / "confidence").mkdir(parents=True, exist_ok=True)

    H, W = np.asarray(depth).shape
    conf = np.ones((H, W), np.float64)
    for c in stage_confidences:
        c = np.asarray(c, np.float64)
        if c.shape != (H, W):
            ys = (np.arange(H) * (c.shape[0] / H)).astype(np.int64)
            xs = (np.arange(W) * (c.shape[1] / W)).astype(np.int64)
            c = c[ys][:, xs]
        conf = conf * c
    write_pfm(out_dir / "depth_est" / f"{view_idx:08d}.pfm",
              np.asarray(depth, np.float32))
    write_pfm(out_dir / "confidence" / f"{view_idx:08d}.pfm",
              conf.astype(np.float32))
    return out_dir
