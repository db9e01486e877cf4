"""Conditioned residual MLP (the NeRF field network).

Behavioral reference: src/models/resnetfc.py:18-159 in malteprinzler/diner.
Input is (latent | features) concatenated along the last axis; the latent part
is injected per-block via linear maps before the view-combine layer, at which
the view axis is mean-reduced. Second linear of every residual block is
zero-initialized so blocks start as identity.

DINER config: n_blocks=5, d_hidden=512, combine_layer=3, ReLU
(configs/train_dtu.yaml:47-50).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

# Torch's kaiming_normal_(a=0, mode="fan_in") == variance_scaling(2, fan_in, normal).
_kaiming_exact = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


class ResnetBlockFC(nn.Module):
    """2-layer residual MLP block; fc_1 zero-init (identity at init)."""

    size_out: Optional[int] = None
    size_h: Optional[int] = None
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)

    @nn.compact
    def __call__(self, x):
        size_in = x.shape[-1]
        size_out = self.size_out or size_in
        size_h = self.size_h or min(size_in, size_out)

        net = nn.Dense(size_h, kernel_init=_kaiming_exact,
                       dtype=self.dtype)(nn.relu(x))
        dx = nn.Dense(size_out, kernel_init=nn.initializers.zeros,
                      dtype=self.dtype)(nn.relu(net))
        if size_in == size_out:
            x_s = x
        else:
            x_s = nn.Dense(size_out, use_bias=False, kernel_init=_kaiming_exact,
                           dtype=self.dtype)(x)
        return x_s + dx


class ResnetFC(nn.Module):
    """Residual MLP with per-block latent injection and mid-network view combine.

    Call with zx of shape (..., V, ..., d_latent + d_in) and `combine_axis`
    pointing at the view axis V (negative axes not supported); the axis is
    mean-reduced when the block index reaches `combine_layer`.
    """

    d_in: int
    d_out: int = 4
    n_blocks: int = 5
    d_latent: int = 0
    d_hidden: int = 128
    combine_layer: int = 1000
    dtype: Optional[jnp.dtype] = None  # compute dtype (params stay f32)
    # per-channel init for the output bias, with the marked channels' kernel
    # columns zero-initialized. The sigma channel must start as a pure bias:
    # relu(w . relu(h)) of a random projection is dead (negative) over whole
    # input distributions at init — the point-independent component of the
    # projection dominates — and a dead density head freezes NeRF training
    # entirely (zero compositing weights -> zero gradients; observed in
    # practice). sigma = bias at init keeps gradients alive everywhere.
    out_bias_init: Optional[tuple] = None
    zero_init_out_channels: tuple = ()

    @nn.compact
    def __call__(self, zx, combine_axis: int = 1):
        assert zx.shape[-1] == self.d_latent + self.d_in
        if self.dtype is not None:
            zx = zx.astype(self.dtype)
        if self.d_latent > 0:
            z = zx[..., : self.d_latent]
            x = zx[..., self.d_latent:]
        else:
            z = None
            x = zx

        if self.d_in > 0:
            x = nn.Dense(self.d_hidden, kernel_init=_kaiming_exact,
                         dtype=self.dtype, name="lin_in")(x)
        else:
            x = jnp.zeros((*zx.shape[:-1], self.d_hidden), zx.dtype)

        for blkid in range(self.n_blocks):
            if blkid == self.combine_layer:
                # keep the view average in the compute dtype: XLA otherwise
                # upcasts the reduction to f32 and round-trips the whole
                # (B, d_hidden) activation through HBM in f32 (~2% of render
                # time); a 4-term bf16 mean loses <2 ulp
                x = jnp.mean(x, axis=combine_axis,
                             dtype=self.dtype if self.dtype is not None
                             else None)
            if self.d_latent > 0 and blkid < self.combine_layer:
                tz = nn.Dense(self.d_hidden, kernel_init=_kaiming_exact,
                              dtype=self.dtype, name=f"lin_z_{blkid}")(z)
                x = x + tz
            x = ResnetBlockFC(dtype=self.dtype, name=f"block_{blkid}")(x)

        if self.out_bias_init is not None:
            bias_init = lambda key, shape, dtype=jnp.float32: jnp.asarray(
                self.out_bias_init, dtype)
        else:
            bias_init = nn.initializers.zeros

        def kernel_init(key, shape, dtype=jnp.float32):
            k = _kaiming_exact(key, shape, dtype)
            for c in self.zero_init_out_channels:
                k = k.at[:, c].set(0.0)
            return k

        out = nn.Dense(self.d_out, kernel_init=kernel_init, dtype=self.dtype,
                       bias_init=bias_init, name="lin_out")(nn.relu(x))
        return out.astype(jnp.float32)
