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

from diner_tpu.image_ops.grid_sample import pack_quad


def deform_conv2d(x, offset, mask, weight, bias=None):
    """Deformable convolution v2 (stride 1, 'same' padding, square kernel).

    x: (N, H, W, C); offset: (N, H, W, 2*K*K) interleaved (dy, dx) per kernel
    tap (row-major); mask: (N, H, W, K*K) in [0, 1]; weight: (K, K, C, O).
    Returns (N, H, W, O). Out-of-image taps read zeros (torchvision semantics).

    TPU note: the bilinear tap fetch is ONE row-gather per tap from a
    quad-packed (pack_quad) 1-px zero-padded copy of x, instead of 4 separate
    corner gathers — the v5e gather unit is issue-rate bound, so this is ~4x
    on the dominant cost of the FeatureNet DCN heads (PERFORMANCE.md round 3).
    Zero padding makes it EXACT: every bilinear window around a clipped
    sample position lies inside the padded image, and any corner outside the
    original image reads a stored zero (torchvision's zeros semantics), so no
    window clamping or corner masking is needed.
    """
    N, H, W, C = x.shape
    K = weight.shape[0]
    taps = K * K
    pad = (K - 1) // 2

    # sample COORDINATES stay f32 even when features are bf16 (bf16 would
    # quantize positions to ~2px on 640-wide maps); only the 4-corner blend
    # weights drop to the feature dtype
    f32 = jnp.float32
    ky, kx = jnp.meshgrid(jnp.arange(K, dtype=f32) - pad,
                          jnp.arange(K, dtype=f32) - pad, indexing="ij")
    ky = ky.reshape(-1)  # (taps,)
    kx = kx.reshape(-1)

    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=f32),
                          jnp.arange(W, dtype=f32), indexing="ij")
    off = offset.reshape(N, H, W, taps, 2).astype(f32)
    sy = gy[None, :, :, None] + ky + off[..., 0]  # (N, H, W, taps)
    sx = gx[None, :, :, None] + kx + off[..., 1]

    # clip to [-1, size]: at the clip value the surviving bilinear corner is
    # a stored zero, so every clipped (fully-outside) sample evaluates to
    # exactly 0 — matching unclipped zeros-padding semantics
    sx = jnp.clip(sx, -1.0, float(W))
    sy = jnp.clip(sy, -1.0, float(H))
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = (sx - x0)[..., None].astype(x.dtype)
    wy = (sy - y0)[..., None].astype(x.dtype)

    xq = pack_quad(jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0))))
    xq = xq.reshape(N, (H + 2) * (W + 2), 4 * C)
    idx = ((y0.astype(jnp.int32) + 1) * (W + 2)
           + (x0.astype(jnp.int32) + 1))  # (N, H, W, taps)

    # scan over the K*K taps, accumulating the output: only ONE tap's
    # gathered rows are live at a time. A single all-taps gather materializes
    # (N, H*W*taps, 4C) — padded to 128 lanes by the (8, 128) tiling that is
    # f32[5, 2.95M, 128] = 7 GiB at the batched stage-3 head, and its
    # (N, H, W, taps, 4C) reshape another 12.5 GiB -> OOM on a 16 GB chip.
    # The gather unit is issue-rate bound, so 9 smaller gathers cost the same
    # as one big one.
    O = weight.shape[-1]
    xs = (jnp.moveaxis(idx.reshape(N, -1, taps), -1, 0),        # (taps, N, HW)
          jnp.moveaxis(wx.reshape(N, -1, taps), -1, 0),
          jnp.moveaxis(wy.reshape(N, -1, taps), -1, 0),
          jnp.moveaxis(mask.astype(x.dtype).reshape(N, -1, taps), -1, 0),
          weight.reshape(taps, C, O))

    def tap_body(acc, tap):
        idx_k, wx_k, wy_k, m_k, w_k = tap
        rows = jnp.take_along_axis(xq, idx_k[..., None], axis=1)  # (N, HW, 4C)
        p00 = rows[..., 0 * C:1 * C]
        p01 = rows[..., 1 * C:2 * C]  # right
        p10 = rows[..., 2 * C:3 * C]  # down
        p11 = rows[..., 3 * C:4 * C]  # diag
        wx_k = wx_k[..., None]
        wy_k = wy_k[..., None]
        s = (p00 * (1 - wx_k) * (1 - wy_k) + p01 * wx_k * (1 - wy_k)
             + p10 * (1 - wx_k) * wy_k + p11 * wx_k * wy_k)
        s = s * m_k[..., None]
        return acc + jnp.einsum("npc,co->npo", s, w_k,
                                preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((N, H * W, O), jnp.float32)
    out, _ = jax.lax.scan(tap_body, acc0, xs)
    out = out.astype(x.dtype).reshape(N, H, W, O)
    if bias is not None:
        out = out + bias
    return out


def deform_conv2d_window(x, offset, mask, weight, bias=None, margin: int = 2):
    """Gather-free deformable conv: a data-weighted stencil over statically
    shifted feature maps. Same signature/params as `deform_conv2d`.

    Every tap displacement k + offset is clamped to [-margin, margin) around
    its pixel, and the bilinear sample is rebuilt from the (2*margin+2)^2
    static shifts of the zero-padded map — so the op contains NO gather at
    all. The v5e gather unit is issue-rate bound (~120-150M rows/s,
    PERFORMANCE.md) and the 9-tap DCN heads dominate the FeatureNet profile;
    the stencil form replaces 9*H*W gather rows per layer with fused
    shifted-slice multiply-adds on the VPU.

    Key identity: the DCN mask is a per-pixel SCALAR and the kernel matmul
    is linear, so both commute with the bilinear blend:
        out[p] = sum_t m_t(p) * sum_s w_{t,s}(p) * (x[p+s] @ W_t)
    with s over static window shifts and w_{t,s} the bilinear corner weight
    (nonzero for at most 4 shifts per tap). Z_t = x @ W_t is computed once
    per tap (MXU) and the shift loop is an XLA-fused stencil over Z_t.

    Exactness: bit-equal in exact arithmetic to `deform_conv2d` whenever all
    |k + offset| < margin - 1e-3 (the clip below reserves 1e-3 at the far
    edge so floor() stays in [-R, R-1]), i.e. |offset| < margin - 1 - 1e-3
    for a 3x3 kernel (offsets are zero-init, reference dcn.py:43-80, and
    stay well under 1 px after training); taps beyond the window are clamped
    to its edge instead of to the image bound. Training caveat: the clamp
    zeroes the gradient w.r.t. offsets that drift past the window, so taps
    outside it stop receiving offset gradient through this op — training
    with dcn_impl="window" cannot pull a runaway offset back via this tap
    (the mask/weight branches still train). Default stays the exact gather
    implementation — this is an opt-in throughput knob
    (`TransMVSNet(dcn_impl="window")`).
    """
    N, H, W, C = x.shape
    K = weight.shape[0]
    taps = K * K
    pad = (K - 1) // 2
    O = weight.shape[-1]
    R = int(margin)

    f32 = jnp.float32
    ky, kx = jnp.meshgrid(jnp.arange(K, dtype=f32) - pad,
                          jnp.arange(K, dtype=f32) - pad, indexing="ij")
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)

    off = offset.reshape(N, H, W, taps, 2).astype(f32)
    # displacement relative to the pixel, clamped into the window; the -1e-3
    # keeps floor() in [-R, R-1] so every bilinear corner is a valid shift
    dy = jnp.clip(ky + off[..., 0], -float(R), R - 1e-3)  # (N, H, W, taps)
    dx = jnp.clip(kx + off[..., 1], -float(R), R - 1e-3)
    c0y = jnp.floor(dy)
    c0x = jnp.floor(dx)
    fy = (dy - c0y).astype(x.dtype)
    fx = (dx - c0x).astype(x.dtype)
    c0y = c0y.astype(jnp.int32)
    c0x = c0x.astype(jnp.int32)
    m = mask.astype(x.dtype)  # (N, H, W, taps)

    def per_tap(t):  # -> (taps, N, H, W)
        return jnp.moveaxis(t, -1, 0)

    xs = (weight.reshape(taps, C, O).astype(x.dtype), per_tap(c0y),
          per_tap(c0x), per_tap(fy), per_tap(fx), per_tap(m))

    def tap_body(acc, tap):
        wt, c0y_t, c0x_t, fy_t, fx_t, m_t = tap
        z = jnp.einsum("nhwc,co->nhwo", x, wt,
                       preferred_element_type=jnp.float32).astype(x.dtype)
        # corners span shifts [-R, R] (c0 in [-R, R-1], +1 for the far corner)
        zp = jnp.pad(z, ((0, 0), (R, R + 1), (R, R + 1), (0, 0)))
        y = jnp.zeros((N, H, W, O), f32)
        for a in range(-R, R + 1):
            wy = jnp.where(c0y_t == a, 1 - fy_t, 0) \
                + jnp.where(c0y_t == a - 1, fy_t, 0)
            for b in range(-R, R + 1):
                wx = jnp.where(c0x_t == b, 1 - fx_t, 0) \
                    + jnp.where(c0x_t == b - 1, fx_t, 0)
                wgt = (wy * wx * m_t)[..., None]
                zs = jax.lax.slice(
                    zp, (0, R + a, R + b, 0), (N, R + a + H, R + b + W, O))
                y = y + (wgt * zs).astype(f32)
        return acc + y, None

    acc0 = jnp.zeros((N, H, W, O), f32)
    out, _ = jax.lax.scan(tap_body, acc0, xs)
    out = out.astype(x.dtype)
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
    # geometry stays f32 even for bf16 features: pixel coordinates at
    # 640-wide maps need more than bf16's 8 mantissa bits
    dtype = jnp.float32

    proj = jnp.einsum("bij,bjk->bik", src_proj.astype(dtype),
                      jnp.linalg.inv(ref_proj.astype(dtype)))
    rot = proj[:, :3, :3]
    trans = proj[:, :3, 3]

    gy, gx = jnp.meshgrid(jnp.arange(H, dtype=dtype),
                          jnp.arange(W, dtype=dtype), indexing="ij")
    xyz = jnp.stack([gx.ravel(), gy.ravel(), jnp.ones(H * W, dtype)], 0)  # (3, HW)
    rot_xyz = jnp.einsum("bij,jn->bin", rot, xyz)  # (B, 3, HW)
    d = depth_values.astype(dtype).reshape(B, 1, D, -1)  # (B, 1, D, 1 or HW)
    pts = rot_xyz[:, :, None, :] * d + trans[:, :, None, None]  # (B, 3, D, HW)

    invalid = pts[:, 2] < 1e-6  # (B, D, HW)
    z = jnp.where(invalid, 1.0, pts[:, 2])
    # pixel coords (align_corners=True convention: x = (u+1)/2*(W-1))
    px = pts[:, 0] / z  # (B, D, HW)
    py = pts[:, 1] / z
    px = jnp.where(invalid, -99.0, px)
    py = jnp.where(invalid, -99.0, py)

    # ONE quad-gather per sample instead of 4 corner gathers (the gather
    # unit is issue-rate bound — see deform_conv2d): bilinear-with-zeros from
    # a quad-packed 1-px zero-padded copy; clipping to [-1, size] keeps every
    # window in range and makes fully-outside samples exactly 0
    px = jnp.clip(px, -1.0, float(W))
    py = jnp.clip(py, -1.0, float(H))
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = (px - x0).reshape(B, -1, 1).astype(src_fea.dtype)
    wy = (py - y0).reshape(B, -1, 1).astype(src_fea.dtype)
    sq = pack_quad(jnp.pad(src_fea, ((0, 0), (1, 1), (1, 1), (0, 0))))
    sq = sq.reshape(B, (H + 2) * (W + 2), 4 * C)
    idx = ((y0.astype(jnp.int32) + 1) * (W + 2)
           + (x0.astype(jnp.int32) + 1)).reshape(B, -1)
    rows = jnp.take_along_axis(sq, idx[..., None], axis=1)  # (B, DHW, 4C)
    p00 = rows[..., 0 * C:1 * C]
    p01 = rows[..., 1 * C:2 * C]
    p10 = rows[..., 2 * C:3 * C]
    p11 = rows[..., 3 * C:4 * C]
    warped = (p00 * (1 - wx) * (1 - wy) + p01 * wx * (1 - wy)
              + p10 * (1 - wx) * wy + p11 * wx * wy)
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
