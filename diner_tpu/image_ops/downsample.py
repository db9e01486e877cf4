"""Foreground-aware downsampling.

Behavioral reference: src/util/torch_helpers.py:162-212 (masked_downsampling)
in malteprinzler/diner: integer-factor average pooling that does not wash
background color into the foreground; mask decides fg via nearest sampling.
"""

from __future__ import annotations

import jax.numpy as jnp

from diner_tpu.image_ops.resize import avg_pool2d
from diner_tpu.image_ops.grid_sample import grid_sample


def _nearest_downsample(x, factor: int):
    """Nearest sampling at output-pixel centers (matches the reference grid)."""
    H, W = x.shape[-3], x.shape[-2]
    h, w = H // factor, W // factor
    ys = (jnp.arange(factor / 2.0, H, factor) / H) * 2 - 1
    xs = (jnp.arange(factor / 2.0, W, factor) / W) * 2 - 1
    gx, gy = jnp.meshgrid(xs, ys)
    uv = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)
    uv = jnp.broadcast_to(uv, (*x.shape[:-3], h * w, 2))
    out = grid_sample(x, uv, mode="nearest", padding_mode="border")
    return out.reshape((*x.shape[:-3], h, w, x.shape[-1]))


def masked_downsample(x, mask, factor: int, mode: str = "average", bg_color: float = 0.0):
    """Downsample (..., H, W, C) by integer `factor` without fg/bg color bleed.

    mask: (..., H, W, 1) with 1=fg. For "average": fg output pixels average only
    fg input pixels; pixels whose nearest-sampled mask is background get
    `bg_color`. For "nearest": plain nearest sampling.

    Parity note: like the reference (torch_helpers.py:188-194), the numerator
    zeroes pixels with mask < 1 while the denominator sums the RAW mask — so
    values under partial alpha (0 < mask < 1) are darkened proportionally.
    Feed a binary mask when that bias is unwanted.
    """
    if x.shape[-3] % factor or x.shape[-2] % factor:
        raise ValueError("spatial dims must be divisible by factor")
    if mode == "nearest":
        return _nearest_downsample(x, factor)
    if mode != "average":
        raise ValueError(f"unknown mode {mode!r}")

    fg = (mask >= 1).astype(x.dtype)
    x_sum = avg_pool2d(x * fg, factor) * (factor * factor)
    m_sum = avg_pool2d(mask.astype(x.dtype), factor) * (factor * factor)
    m_nearest = _nearest_downsample(mask.astype(x.dtype), factor)

    is_fg = m_nearest > 0
    avg = x_sum / jnp.where(m_sum == 0, 1.0, m_sum)
    out = jnp.where(is_fg, avg, bg_color)
    return out
