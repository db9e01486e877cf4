"""MVS core ops: deformable conv as bilinear gather, differentiable homography
warping, cascade depth-hypothesis generation, winner-take-all depth.

Behavioral references in malteprinzler/diner:
- deform_conv2d: torchvision's CUDA op wrapped at deps/TransMVSNet/models/
  dcn.py:43-80 (learned offset+mask branch, zero-init). On TPU the op is a
  9-point bilinear gather + masked weighted sum, which XLA maps to gathers +
  one MXU matmul (SURVEY.md §2.2 item 2). Offsets are learned from zero init,
  so the (dy, dx) channel convention is self-consistent.
- homo_warping: deps/TransMVSNet/models/module.py:284-322 (grid_sample-based
  plane-sweep warp, align_corners=True, invalid z -> far outside).
- get_depth_range_samples: module.py:590-619.
- depth_wta: module.py:473-477.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diner_tpu.image_ops import grid_sample


def deform_conv2d(x, offset, mask, weight, bias=None):
    """Deformable convolution v2 (stride 1, 'same' padding, square kernel).

    x: (N, H, W, C); offset: (N, H, W, 2*K*K) interleaved (dy, dx) per kernel
    tap (row-major); mask: (N, H, W, K*K) in [0, 1]; weight: (K, K, C, O).
    Returns (N, H, W, O). Out-of-image taps read zeros (torchvision semantics).
    """
    N, H, W, C = x.shape
    K = weight.shape[0]
    taps = K * K
    pad = (K - 1) // 2

    ky, kx = jnp.meshgrid(jnp.arange(K, dtype=x.dtype) - pad,
                          jnp.arange(K, dtype=x.dtype) - pad, indexing="ij")
    ky = ky.reshape(-1)  # (taps,)
    kx = kx.reshape(-1)

    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=x.dtype),
                          jnp.arange(W, dtype=x.dtype), indexing="ij")
    off = offset.reshape(N, H, W, taps, 2)
    sy = gy[None, :, :, None] + ky + off[..., 0]  # (N, H, W, taps)
    sx = gx[None, :, :, None] + kx + off[..., 1]

    # bilinear gather with zero padding, expressed through grid_sample
    # (align_corners=False unnormalization inverse: u = (px + .5) / W * 2 - 1)
    u = (sx + 0.5) / W * 2.0 - 1.0
    v = (sy + 0.5) / H * 2.0 - 1.0
    uv = jnp.stack([u, v], axis=-1).reshape(N, H * W * taps, 2)
    samples = grid_sample(x, uv, mode="bilinear", padding_mode="zeros")
    samples = samples.reshape(N, H, W, taps, C)

    samples = samples * mask[..., None]
    out = jnp.einsum("nhwkc,kco->nhwo", samples,
                     weight.reshape(taps, C, weight.shape[-1]))
    if bias is not None:
        out = out + bias
    return out


def homo_warping(src_fea, src_proj, ref_proj, depth_values):
    """Plane-sweep warp of source features into the reference frustum.

    src_fea: (B, H, W, C); src_proj/ref_proj: (B, 4, 4) = K-premultiplied
    [R|t] (module.py:65-68 composition); depth_values: (B, D) or (B, D, H, W).
    Returns (B, D, H, W, C).
    """
    B, H, W, C = src_fea.shape
    D = depth_values.shape[1]
    dtype = src_fea.dtype

    proj = jnp.einsum("bij,bjk->bik", src_proj, jnp.linalg.inv(ref_proj))
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=dtype),
                          jnp.arange(W, dtype=dtype), indexing="ij")
    xyz = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(H * W, dtype)], 0)  # (3, HW)
    rot_xyz = jnp.einsum("bij,jn->bin", rot, xyz)  # (B, 3, HW)
    d = depth_values.reshape(B, 1, D, -1)  # (B, 1, D, 1 or HW)
    pts = rot_xyz[:, :, None, :] * d + trans[:, :, None, None]  # (B, 3, D, HW)

    invalid = pts[:, 2] < 1e-6  # (B, D, HW)
    z = jnp.where(invalid, 1.0, pts[:, 2])
    u = pts[:, 0] / z / ((W - 1) / 2.0) - 1.0
    v = pts[:, 1] / z / ((H - 1) / 2.0) - 1.0
    u = jnp.where(invalid, -99.0, u)
    v = jnp.where(invalid, -99.0, v)
    uv = jnp.stack([u, v], axis=-1).reshape(B, D * H * W, 2)

    warped = grid_sample(src_fea, uv, mode="bilinear", padding_mode="zeros",
                         align_corners=True)
    return warped.reshape(B, D, H, W, C)


def depth_range_samples(cur_depth, ndepth: int, depth_interval_pixel, shape):
    """Per-pixel depth hypotheses.

    Stage 1: cur_depth (B, D_full) full range -> linspace over [min, max].
    Stages 2+: cur_depth (B, H, W) previous depth -> +-ndepth/2 * interval
    around it. Returns (B, ndepth, H, W).
    """
    B, H, W = shape
    steps = jnp.arange(ndepth, dtype=jnp.float32)
    if cur_depth.ndim == 2:
        lo = cur_depth[:, 0]
        hi = cur_depth[:, -1]
        interval = (hi - lo) / (ndepth - 1)  # (B,)
        d = lo[:, None] + steps[None] * interval[:, None]  # (B, D)
        return jnp.broadcast_to(d[:, :, None, None], (B, ndepth, H, W))
    lo = cur_depth - ndepth / 2 * depth_interval_pixel  # (B, H, W)
    hi = cur_depth + ndepth / 2 * depth_interval_pixel
    interval = (hi - lo) / (ndepth - 1)
    return lo[:, None] + steps[None, :, None, None] * interval[:, None]


def depth_wta(prob_volume, depth_values):
    """Winner-take-all depth: argmax over the hypothesis axis.

    prob_volume: (B, D, H, W); depth_values: (B, D, H, W). Returns (B, H, W).
    """
    idx = jnp.argmax(prob_volume, axis=1, keepdims=True)
    return jnp.take_along_axis(depth_values, idx, axis=1)[:, 0]
