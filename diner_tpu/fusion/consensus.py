"""Consensus point-cloud fusion — the fusibile-equivalent, as one XLA program.

Behavioral reference: deps/TransMVSNet/deps/fusibile/fusibile.cu:138-277 in
malteprinzler/diner (the repo's only native CUDA component): one thread per
reference pixel backprojects its depth, reprojects into every other view,
accepts views whose depth agrees (|disparity difference| < depth_thresh) and
whose normal deviates < normal_thresh, averages the consistent 3D points /
normals / colors, and keeps points with >= num_consistent agreeing views.

TPU-native shape: the per-pixel CUDA kernel becomes a vmapped
gather/compare/reduce over all V views at once (SURVEY.md §2.2 item 1);
PLY serialization happens on the host (diner_tpu.fusion.ply, with a native
C++ writer).

Depth agreement supports two modes:
  - "relative" (default): |z - d_s| / d_s < depth_thresh — scale-free, the
    natural threshold for metric scenes;
  - "disparity": |f_ref * B * (1/z - 1/d_s)| < depth_thresh — fusibile's
    exact accept test (fusibile.cu:51-54,206-209: both depths converted to
    disparity with the REF camera's fx (cameraGeometryUtils.h:400-401) and
    the ref-src baseline ||C_r - C_s||), for parity with published fusibile
    point clouds (depthThresh in pixels of disparity).
(The gipuma driver's fake-normal path makes the normal test trivially pass;
normals are optional.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def consensus_fusion(depths, intrinsics, extrinsics, colors=None, normals=None,
                     depth_thresh: float = 0.01, normal_thresh: float = 0.5,
                     num_consistent: int = 3, depth_mode: str = "relative"):
    """Fuse per-view depth maps into a consensus point set.

    depths: (V, H, W) metric, 0 invalid; intrinsics: (V, 3, 3);
    extrinsics: (V, 4, 4) world->cam; colors: optional (V, H, W, 3);
    normals: optional (V, H, W, 3) cam-space; depth_mode: "relative" or
    "disparity" (fusibile parity — see module docstring; depth_thresh is
    then in disparity pixels).

    Returns dict of per-reference-pixel arrays, flattened over (V, H, W):
      points (N, 3), colors (N, 3), normals (N, 3), keep (N,) bool —
    host code filters by `keep` and writes the PLY.
    """
    if depth_mode not in ("relative", "disparity"):
        raise ValueError(f"depth_mode must be relative|disparity, got {depth_mode!r}")
    # coerce host arrays: vmapped tracer indexing into raw numpy fails
    depths = jnp.asarray(depths)
    intrinsics = jnp.asarray(intrinsics)
    extrinsics = jnp.asarray(extrinsics)
    if colors is not None:
        colors = jnp.asarray(colors)
    if normals is not None:
        normals = jnp.asarray(normals)
    V, H, W = depths.shape
    dtype = depths.dtype
    gx, gy = jnp.meshgrid(jnp.arange(W, dtype=dtype), jnp.arange(H, dtype=dtype))
    pix = jnp.stack([gx, gy, jnp.ones_like(gx)], 0).reshape(3, -1)  # (3, HW)

    inv_K = jnp.linalg.inv(intrinsics)  # (V, 3, 3)
    poses = jnp.linalg.inv(extrinsics)  # cam->world

    def backproject(v):
        xyz_cam = inv_K[v] @ (pix * depths[v].ravel())  # (3, HW)
        return (poses[v, :3, :3] @ xyz_cam + poses[v, :3, 3:4]).T  # (HW, 3)

    world_pts = jax.vmap(backproject)(jnp.arange(V))  # (V, HW, 3)

    if normals is None:
        # fusibile's fake-normal path stores the IDENTICAL constant in every
        # view ((1,1,1)/sqrt(3), gipuma driver), so the normal gate passes
        # trivially. A per-view camera-frame constant rotated to world would
        # instead encode cos(relative view angle) and reject every pair wider
        # than normal_thresh — emptying the cloud on real multi-view rigs.
        world_normals = jnp.full((V, H * W, 3), 3.0 ** -0.5, dtype)
    else:
        world_normals = jnp.einsum(
            "vij,vnj->vni", jnp.swapaxes(extrinsics[:, :3, :3], -1, -2),
            normals.reshape(V, -1, 3))
    if colors is None:
        colors = jnp.ones((V, H, W, 3), dtype)
    colors = colors.reshape(V, -1, 3)

    def fuse_ref(r):
        pts_r = world_pts[r]  # (HW, 3)
        valid_r = depths[r].ravel() > 0

        def against(s):
            cam = jnp.einsum("ij,nj->ni", extrinsics[s, :3, :3], pts_r) \
                + extrinsics[s, :3, 3]
            z = cam[:, 2]
            uvw = jnp.einsum("ij,nj->ni", intrinsics[s], cam)
            u = uvw[:, 0] / jnp.where(z == 0, 1.0, z)
            v_ = uvw[:, 1] / jnp.where(z == 0, 1.0, z)
            ju = jnp.clip(jnp.round(u).astype(jnp.int32), 0, W - 1)
            jv = jnp.clip(jnp.round(v_).astype(jnp.int32), 0, H - 1)
            inside = (u >= -0.5) & (u < W - 0.5) & (v_ >= -0.5) & (v_ < H - 0.5) \
                & (z > 0)
            idx = jv * W + ju
            d_s = depths[s].ravel()[idx]
            if depth_mode == "disparity":
                # fusibile.cu:206-209 — both depths to disparity with the
                # ref fx and the ref-src camera-center baseline
                f_ref = intrinsics[r, 0, 0]
                baseline = jnp.linalg.norm(poses[r, :3, 3] - poses[s, :3, 3])
                inv_z = 1.0 / jnp.where(z <= 0, 1.0, z)
                inv_d = 1.0 / jnp.where(d_s <= 0, 1.0, d_s)
                agree = jnp.abs(f_ref * baseline * (inv_z - inv_d)) \
                    < depth_thresh
            else:
                rel = jnp.abs(z - d_s) / jnp.where(d_s == 0, 1.0, d_s)
                agree = rel < depth_thresh
            n_dot = jnp.sum(world_normals[r] * world_normals[s][idx], axis=-1)
            ok = inside & (d_s > 0) & agree \
                & (n_dot > jnp.cos(normal_thresh)) & (s != r)
            # the consistent source contributes ITS 3D point for averaging
            return ok, world_pts[s][idx], world_normals[s][idx], colors[s][idx]

        ok, pts_s, nrm_s, col_s = jax.vmap(against)(jnp.arange(V))
        okf = ok.astype(dtype)[..., None]
        n_ok = jnp.sum(ok, axis=0)  # (HW,)
        denom = (n_ok + 1).astype(dtype)[:, None]
        avg_pts = (pts_r + jnp.sum(pts_s * okf, 0)) / denom
        avg_nrm = (world_normals[r] + jnp.sum(nrm_s * okf, 0)) / denom
        avg_col = (colors[r] + jnp.sum(col_s * okf, 0)) / denom
        keep = valid_r & (n_ok >= num_consistent)
        return avg_pts, avg_nrm, avg_col, keep

    pts, nrm, col, keep = jax.vmap(fuse_ref)(jnp.arange(V))
    return {
        "points": pts.reshape(-1, 3),
        "normals": nrm.reshape(-1, 3),
        "colors": col.reshape(-1, 3),
        "keep": keep.reshape(-1),
    }
