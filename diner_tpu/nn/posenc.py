"""NeRF positional encoding (pure function; no parameters).

Behavioral reference: src/models/positional_encoding.py:9-53 in
malteprinzler/diner. Output layout per input vector (D = d_in, F = num_freqs):

    [x (if include_input),
     sin(f0*x_0..D), cos(f0*x_0..D),
     sin(f1*x_0..D), cos(f1*x_0..D), ...]

with f_k = freq_factor * 2^k. DINER configs use num_freqs=6,
freq_factor=6.28, include_input=True (configs/train_dtu.yaml:40-43).
"""

from __future__ import annotations

import jax.numpy as jnp


def posenc_dim(d_in: int, num_freqs: int, include_input: bool = True) -> int:
    return num_freqs * 2 * d_in + (d_in if include_input else 0)


def posenc(x, num_freqs: int = 6, freq_factor: float = 6.28,
           include_input: bool = True):
    """Encode (..., D) -> (..., posenc_dim(D))."""
    freqs = freq_factor * (2.0 ** jnp.arange(num_freqs, dtype=x.dtype))  # (F,)
    xf = x[..., None, :] * freqs[:, None]  # (..., F, D)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    enc = jnp.stack([sin, cos], axis=-2)  # (..., F, 2, D)
    enc = enc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
