"""Resizing/pooling primitives with exact torch-matching semantics.

Behavioral reference: torch F.interpolate(mode="bilinear", align_corners=True)
as used for the encoder's latent pyramid (src/models/image_encoder.py:281-289)
and AvgPool2d for the antibias loss (src/losses/antibiasloss.py:4-14).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def resize_bilinear_align_corners(img, out_hw):
    """Separable bilinear resize, align_corners=True (src = i*(in-1)/(out-1)).

    img: (..., H, W, C) -> (..., H_out, W_out, C).
    """
    H_out, W_out = out_hw
    H, W = img.shape[-3], img.shape[-2]

    def axis_resize(x, size_in, size_out, axis):
        if size_in == size_out:
            return x
        if size_out == 1:
            src = jnp.zeros((1,), dtype=x.dtype)
        else:
            src = jnp.arange(size_out, dtype=x.dtype) * ((size_in - 1) / (size_out - 1))
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, size_in - 1)
        hi = jnp.clip(lo + 1, 0, size_in - 1)
        w = (src - lo.astype(x.dtype))
        xlo = jnp.take(x, lo, axis=axis)
        xhi = jnp.take(x, hi, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = size_out
        w = w.reshape(shape)
        return xlo * (1 - w) + xhi * w

    out = axis_resize(img, H, H_out, img.ndim - 3)
    out = axis_resize(out, W, W_out, img.ndim - 2)
    return out


def avg_pool2d(img, k: int):
    """Non-overlapping k x k average pooling on (..., H, W, C)."""
    batch_shape = img.shape[:-3]
    H, W, C = img.shape[-3:]
    x = img.reshape((-1, H, W, C))
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, k, k, 1),
        window_strides=(1, k, k, 1),
        padding="VALID",
    ) / float(k * k)
    return out.reshape((*batch_shape, H // k, W // k, C))
