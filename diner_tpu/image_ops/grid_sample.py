"""Pixel-aligned sampling: a TPU-friendly `grid_sample` built from XLA gathers.

Behavioral reference: torch.nn.functional.grid_sample with align_corners=False
as used throughout malteprinzler/diner (src/models/image_encoder.py:117-220),
plus the project's custom "exponential" padding extension
(src/util/torch_helpers.py:99-159) used for depth-std extrapolation.

Semantics (align_corners=False): uv in [-1, 1] maps so that -1/+1 are the outer
*edges* of the border pixels; pixel centers live at integer+0.5 / size * 2 - 1.

All maps are NHWC (channels-last, TPU-native). Gathers are flattened-HW
`take_along_axis` calls, which XLA lowers to efficient dynamic-gathers; the
Pallas megakernel path reimplements the same math in-kernel for fused use.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def _unnormalize(coord, size, align_corners: bool = False):
    """[-1, 1] -> pixel coordinate (centers at 0..size-1)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return (coord + 1.0) * 0.5 * size - 0.5


def _gather_hw(img_flat, iy, ix, W):
    """img_flat: (B, H*W, C); iy/ix: (B, N) int32 (already in-range). -> (B, N, C)."""
    idx = iy * W + ix
    # indices are clip-constructed; mode="clip" skips XLA's OOB select pass
    # (which otherwise materializes a second full-size row buffer)
    return jnp.take_along_axis(img_flat, idx[..., None], axis=1, mode="clip")


def grid_sample(img, uv, mode: str = "bilinear", padding_mode: str = "border",
                pad_double_width: float = 20.0, pad_size: int = 40,
                align_corners: bool = False):
    """Sample `img` at normalized coordinates `uv`.

    Args:
      img: (..., H, W, C).
      uv: (..., N, 2) in [-1, 1], (x, y) order; same leading dims as img.
      mode: "bilinear" | "nearest".
      padding_mode: "border" | "zeros" | "exponential".
      pad_double_width / pad_size: exponential-padding parameters (value doubles
        every `pad_double_width` px outside the image, zero beyond `pad_size` px).

    Returns:
      (..., N, C) samples.
    """
    batch_shape = img.shape[:-3]
    H, W, C = img.shape[-3:]
    N = uv.shape[-2]
    imgs = img.reshape((-1, H, W, C))
    uvs = uv.reshape((-1, N, 2))
    B = imgs.shape[0]

    if padding_mode == "exponential":
        if mode != "nearest":
            raise NotImplementedError("exponential padding is defined for nearest mode")
        out = _sample_exponential_nearest(imgs, uvs, pad_double_width, pad_size)
        return out.reshape((*batch_shape, N, C))

    ix = _unnormalize(uvs[..., 0], W, align_corners)  # (B, N)
    iy = _unnormalize(uvs[..., 1], H, align_corners)

    flat = imgs.reshape(B, H * W, C)

    if mode == "nearest":
        jx = jnp.round(ix).astype(jnp.int32)
        jy = jnp.round(iy).astype(jnp.int32)
        valid = (jx >= 0) & (jx < W) & (jy >= 0) & (jy < H)
        vals = _gather_hw(flat, jnp.clip(jy, 0, H - 1), jnp.clip(jx, 0, W - 1), W)
        if padding_mode == "zeros":
            vals = vals * valid[..., None].astype(vals.dtype)
        elif padding_mode != "border":
            raise ValueError(f"unknown padding_mode {padding_mode!r}")
        return vals.reshape((*batch_shape, N, C))

    if mode != "bilinear":
        raise ValueError(f"unknown mode {mode!r}")

    if padding_mode == "border":
        # Torch clips the *coordinate* into [0, size-1] before interpolation;
        # index-clipping after floor produces identical values.
        ix = jnp.clip(ix, 0.0, W - 1.0)
        iy = jnp.clip(iy, 0.0, H - 1.0)

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    wx = ix - x0
    wy = iy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    def corner(yi, xi, w):
        vals = _gather_hw(flat, jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1), W)
        if padding_mode == "zeros":
            ok = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            w = w * ok.astype(w.dtype)
        return vals * w[..., None]

    out = (
        corner(y0i, x0i, (1 - wx) * (1 - wy))
        + corner(y0i, x1i, wx * (1 - wy))
        + corner(y1i, x0i, (1 - wx) * wy)
        + corner(y1i, x1i, wx * wy)
    )
    return out.reshape((*batch_shape, N, C))


def _sample_exponential_nearest(imgs, uvs, double_width, pad):
    """Analytic equivalent of: exponential_pad(img) then nearest/zeros sampling
    of the padded image with the uv grid rescaled by size/(size+2*pad).

    The padded border pixel at Chebyshev distance d (0-based, d=0 adjacent to the
    image) holds border_value * 2^(d / double_width); beyond `pad` px -> 0.
    """
    B, H, W, C = imgs.shape
    Hp, Wp = H + 2 * pad, W + 2 * pad

    # Reference path rescales uv by size/(size+2p) then unnormalizes on the
    # padded image; compose the two affine maps directly.
    ixp = _unnormalize(uvs[..., 0] * (W / Wp), Wp)
    iyp = _unnormalize(uvs[..., 1] * (H / Hp), Hp)
    jxp = jnp.round(ixp).astype(jnp.int32)
    jyp = jnp.round(iyp).astype(jnp.int32)
    valid = (jxp >= 0) & (jxp < Wp) & (jyp >= 0) & (jyp < Hp)

    jx = jxp - pad  # unpadded-image coordinates (may be negative / >= size)
    jy = jyp - pad
    dx = jnp.maximum(jnp.maximum(-jx - 1, jx - W), 0)  # 0-based border distance
    dy = jnp.maximum(jnp.maximum(-jy - 1, jy - H), 0)
    d = jnp.maximum(dx, dy).astype(imgs.dtype)

    flat = imgs.reshape(B, H * W, C)
    base = _gather_hw(flat, jnp.clip(jy, 0, H - 1), jnp.clip(jx, 0, W - 1), W)
    scale = jnp.exp2(d / double_width) * valid.astype(imgs.dtype)
    return base * scale[..., None]


def pack_quad(img):
    """Pack each pixel with its right/down/diag neighbors (edge-clamped):
    (..., H, W, C) -> (..., H, W, 4C) with slots [self, right, down, diag].

    Turns a bilinear/border `grid_sample` into ONE row-gather via
    `grid_sample_quad` — a 4x reduction in gather-unit ops, which bound the
    pixel-aligned feature fetch on TPU (the gather unit is issue-rate limited,
    not bandwidth limited)."""
    right = jnp.concatenate([img[..., :, 1:, :], img[..., :, -1:, :]], axis=-2)
    down = jnp.concatenate([img[..., 1:, :, :], img[..., -1:, :, :]], axis=-3)
    diag = jnp.concatenate([down[..., :, 1:, :], down[..., :, -1:, :]], axis=-2)
    return jnp.concatenate([img, right, down, diag], axis=-1)


def quad_cells(H, W, uv):
    """Texel-cell decomposition of normalized coords for a quad-packed image.

    uv: (..., 2) in [-1, 1] (align_corners=False). Returns (idx, wx, wy):
    idx (int32) the flat H*W row id of the cell's top-left corner, wx/wy the
    in-cell bilinear weights. `quad_blend(rows[idx], wx, wy)` equals
    grid_sample(img, uv, "bilinear", "border") on the unpacked image.
    """
    ix = jnp.clip(_unnormalize(uv[..., 0], W), 0.0, W - 1.0)
    iy = jnp.clip(_unnormalize(uv[..., 1], H), 0.0, H - 1.0)
    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    idx = (jnp.clip(y0.astype(jnp.int32), 0, H - 1) * W
           + jnp.clip(x0.astype(jnp.int32), 0, W - 1))
    return idx, ix - x0, iy - y0


def quad_blend(rows, wx, wy):
    """Bilinear combine of quad-packed corner rows.

    rows: (..., 4C) with slots [self, right, down, diag]; wx/wy: (...)
    in-cell weights (broadcastable against rows' leading dims). -> (..., C).
    """
    C = rows.shape[-1] // 4
    wx = wx[..., None]
    wy = wy[..., None]
    p00 = rows[..., 0 * C:1 * C]
    p01 = rows[..., 1 * C:2 * C]  # right
    p10 = rows[..., 2 * C:3 * C]  # down
    p11 = rows[..., 3 * C:4 * C]
    return (p00 * (1 - wx) * (1 - wy) + p01 * wx * (1 - wy)
            + p10 * (1 - wx) * wy + p11 * wx * wy)


def grid_sample_quad(img_quad, uv):
    """Bilinear/border sampling from a `pack_quad`-packed image.

    img_quad: (..., H, W, 4C); uv: (..., N, 2) in [-1, 1]
    (align_corners=False). Exactly equals
    grid_sample(img, uv, "bilinear", "border") on the unpacked image.
    """
    batch_shape = img_quad.shape[:-3]
    H, W, C4 = img_quad.shape[-3:]
    N = uv.shape[-2]
    imgs = img_quad.reshape((-1, H * W, C4))
    uvs = uv.reshape((-1, N, 2))

    idx, wx, wy = quad_cells(H, W, uvs)
    rows = jnp.take_along_axis(imgs, idx[..., None], axis=1,
                               mode="clip")  # (B, N, 4C)
    out = quad_blend(rows, wx, wy)
    return out.reshape((*batch_shape, N, C4 // 4))


def exponential_pad(img, padding: int, double_width: float):
    """Materialized exponential padding (for tests / visualization).

    img: (B, H, W, C). Replicate-pads by `padding`, multiplying the border by
    2^(chebyshev_border_distance / double_width).
    Behavioral reference: src/util/torch_helpers.py:99-121.
    """
    B, H, W, C = img.shape
    base = jnp.pad(img, ((0, 0), (padding, padding), (padding, padding), (0, 0)), mode="edge")
    yy = jnp.arange(H + 2 * padding)
    xx = jnp.arange(W + 2 * padding)
    dy = jnp.maximum(jnp.maximum(padding - 1 - yy, yy - (H + padding)), 0)
    dx = jnp.maximum(jnp.maximum(padding - 1 - xx, xx - (W + padding)), 0)
    d = jnp.maximum(dy[:, None], dx[None, :]).astype(img.dtype)
    return base * jnp.exp(d / double_width * math.log(2.0))[None, :, :, None]
