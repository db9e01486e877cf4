"""Geometric-consistency depth filtering (jit-compiled XLA, batched over views).

Behavioral reference: deps/TransMVSNet/test.py:222-386 in malteprinzler/diner:
reproject every reference pixel into a source view using the reference depth,
sample the source depth (bilinear), project back, and accept pixels whose
round-trip lands within 1 px and 1% relative depth; average reprojected depths
over consistent views; keep pixels with >= thres_view agreeing sources.

The reference runs this per view-pair in NumPy/cv2 inside a multiprocessing
pool; here the whole pairwise sweep is one vmapped XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diner_tpu.image_ops import grid_sample


def reproject_with_depth(depth_ref, K_ref, ext_ref, depth_src, K_src, ext_src):
    """Round-trip reprojection (test.py:222-259).

    depth_*: (H, W); K_*: (3, 3); ext_*: (4, 4) world->cam.
    Returns (depth_reprojected, x_reproj, y_reproj, x_src, y_src), each (H, W).
    """
    H, W = depth_ref.shape
    dtype = depth_ref.dtype
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype))
    pix = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(H * W, dtype)], 0)  # (3, N)

    xyz_ref = jnp.linalg.inv(K_ref) @ (pix * depth_ref.ravel())
    rel = ext_src @ jnp.linalg.inv(ext_ref)
    xyz_src = rel[:3, :3] @ xyz_ref + rel[:3, 3:4]
    k_src = K_src @ xyz_src
    xy_src = k_src[:2] / k_src[2:3]

    # bilinear sample of the source depth at xy_src (cv2.remap INTER_LINEAR
    # semantics: pixel centers at integer coords == align_corners=False with
    # the +0.5 shift folded in)
    u = (xy_src[0] + 0.5) / W * 2 - 1
    v = (xy_src[1] + 0.5) / H * 2 - 1
    uv = jnp.stack([u, v], -1)[None]
    sampled = grid_sample(depth_src[None, :, :, None], uv, mode="bilinear",
                          padding_mode="zeros")[0, :, 0]

    xyz_src2 = jnp.linalg.inv(K_src) @ (
        jnp.concatenate([xy_src, jnp.ones((1, H * W), dtype)], 0) * sampled)
    rel_back = ext_ref @ jnp.linalg.inv(ext_src)
    xyz_rep = rel_back[:3, :3] @ xyz_src2 + rel_back[:3, 3:4]
    depth_rep = xyz_rep[2].reshape(H, W)
    k_rep = K_ref @ xyz_rep
    xy_rep = k_rep[:2] / jnp.where(k_rep[2:3] == 0, 1.0, k_rep[2:3])
    return (depth_rep, xy_rep[0].reshape(H, W), xy_rep[1].reshape(H, W),
            xy_src[0].reshape(H, W), xy_src[1].reshape(H, W))


def check_geometric_consistency(depth_ref, K_ref, ext_ref, depth_src, K_src,
                                ext_src, pixel_thresh: float = 1.0,
                                rel_depth_thresh: float = 0.01):
    """(mask (H, W) bool, depth_reprojected (H, W) zeroed where inconsistent)."""
    H, W = depth_ref.shape
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=depth_ref.dtype),
                          jnp.arange(H, dtype=depth_ref.dtype))
    depth_rep, xr, yr, _, _ = reproject_with_depth(
        depth_ref, K_ref, ext_ref, depth_src, K_src, ext_src)
    dist = jnp.sqrt((xr - gx) ** 2 + (yr - gy) ** 2)
    rel = jnp.abs(depth_rep - depth_ref) / jnp.where(depth_ref == 0, 1.0,
                                                     depth_ref)
    mask = (dist < pixel_thresh) & (rel < rel_depth_thresh) & (depth_ref > 0)
    return mask, jnp.where(mask, depth_rep, 0.0)


@jax.jit
def filter_depths(depths, intrinsics, extrinsics, confidences,
                  conf_thresh: float = 0.5, thres_view: int = 3):
    """Full pairwise consistency sweep.

    depths: (V, H, W); intrinsics: (V, 3, 3); extrinsics: (V, 4, 4);
    confidences: (V, H, W).
    Returns (depth_averaged (V, H, W), final_mask (V, H, W) bool): per-view
    fused depth (average of consistent reprojections + own) and the
    photometric & geometric acceptance mask (test.py:308-330).
    """
    V = depths.shape[0]

    def per_ref(r):
        def per_src(s):
            mask, dep = check_geometric_consistency(
                depths[r], intrinsics[r], extrinsics[r],
                depths[s], intrinsics[s], extrinsics[s])
            valid = (s != r)
            return mask & valid, dep * valid

        masks, deps = jax.vmap(per_src)(jnp.arange(V))
        geo_sum = jnp.sum(masks, axis=0)
        avg = (jnp.sum(deps, axis=0) + depths[r]) / (geo_sum + 1)
        final = (confidences[r] > conf_thresh) & (geo_sum >= thres_view)
        return avg, final

    return jax.vmap(per_ref)(jnp.arange(V))


def depths_to_world_points(depths, intrinsics, extrinsics, colors, mask):
    """Backproject masked depths to world points (host-side numpy assembly).

    depths: (V, H, W); colors: (V, H, W, 3) in [0, 1]; mask: (V, H, W) bool.
    Returns (points (N, 3) f32, colors (N, 3) uint8).
    """
    import numpy as np

    pts_all, col_all = [], []
    V, H, W = depths.shape
    gx, gy = np.meshgrid(np.arange(W), np.arange(H))
    for v in range(V):
        m = np.asarray(mask[v])
        if not m.any():
            continue
        d = np.asarray(depths[v])[m]
        x, y = gx[m], gy[m]
        xyz_cam = np.linalg.inv(np.asarray(intrinsics[v])) @ (
            np.stack([x, y, np.ones_like(x)]) * d)
        pose = np.linalg.inv(np.asarray(extrinsics[v]))
        xyz_w = pose[:3, :3] @ xyz_cam + pose[:3, 3:4]
        pts_all.append(xyz_w.T.astype(np.float32))
        col_all.append((np.asarray(colors[v])[m] * 255).astype(np.uint8))
    if not pts_all:
        return (np.zeros((0, 3), np.float32), np.zeros((0, 3), np.uint8))
    return np.concatenate(pts_all), np.concatenate(col_all)


@jax.jit
def filter_depths_dynamic(depths, intrinsics, extrinsics, confidences,
                          conf_thresh: float = 0.5):
    """Progressive-threshold consistency ("dynamic fusion").

    Behavioral reference: deps/TransMVSNet/dynamic_fusion.py:117-140 in
    malteprinzler/diner: a pixel is accepted if, for some support level i,
    at least i source views agree within (i/4 px, i/1300 relative depth) —
    looser geometric thresholds demand more supporting views.
    Returns (depth_averaged, final_mask) like filter_depths.
    """
    V = depths.shape[0]
    levels = jnp.arange(1, V)  # support levels 1..V-1

    def per_ref(r):
        def per_src(s):
            def per_level(i):
                mask, dep = check_geometric_consistency(
                    depths[r], intrinsics[r], extrinsics[r],
                    depths[s], intrinsics[s], extrinsics[s],
                    pixel_thresh=i / 4.0, rel_depth_thresh=i / 1300.0)
                return mask & (s != r), dep * (s != r)
            return jax.vmap(per_level)(levels.astype(jnp.float32))

        masks, deps = jax.vmap(per_src)(jnp.arange(V))  # (V, L, H, W)
        geo_per_level = jnp.sum(masks, axis=0)  # (L, H, W)
        ok_any = jnp.any(geo_per_level >= levels[:, None, None], axis=0)
        # average reprojected depths under the tightest thresholds (level 1)
        geo1 = jnp.sum(masks[:, 0], axis=0)
        avg = (jnp.sum(deps[:, 0], axis=0) + depths[r]) / (geo1 + 1)
        final = (confidences[r] > conf_thresh) & ok_any & (depths[r] > 0)
        return avg, final

    return jax.vmap(per_ref)(jnp.arange(V))
