"""NeRF alpha compositing (quadrature) over sorted z samples.

Behavioral reference: src/models/nerf_renderer.py:286-365 (composite) in
malteprinzler/diner. Last delta = far - z_K; alpha = 1 - exp(-delta * sigma);
transmittance cumprod carries the reference's 1e-10 stabilizer; optional white
background adds (1 - sum w).

No chunking here: under jit the whole (SB, B, K) field batch is one fused XLA
program; callers chunk at the ray level if memory demands it.
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_points(rays, z_samp):
    """(points, dirs) flattened to (SB, B*K, 3) for the field."""
    SB, B, K = z_samp.shape
    points = rays[..., None, :3] + z_samp[..., None] * rays[..., None, 3:6]
    dirs = jnp.broadcast_to(rays[..., None, 3:6], points.shape)
    return points.reshape(SB, B * K, 3), dirs.reshape(SB, B * K, 3)


def composite_outputs(rays, z_samp, out, white_bkgd: bool = False):
    """Alpha-composite precomputed field outputs.

    out: (SB, B*K, 4) [rgb, sigma] for the points of `sample_points`.
    Returns (weights (SB, B, K), rgb (SB, B, 3), depth (SB, B)). Split out of
    `composite` so the pipelined renderer can run the field halves itself.
    """
    SB, B, K = z_samp.shape

    deltas = z_samp[..., 1:] - z_samp[..., :-1]
    delta_inf = rays[..., 7:8] - z_samp[..., -1:]
    deltas = jnp.concatenate([deltas, delta_inf], axis=-1)  # (SB, B, K)

    out = out.reshape(SB, B, K, 4)
    rgbs = out[..., :3]
    sigmas = out[..., 3]

    alphas = 1.0 - jnp.exp(-deltas * jnp.maximum(sigmas, 0.0))
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alphas[..., :1]),
                         1.0 - alphas + 1e-10], axis=-1), axis=-1)
    weights = alphas * trans[..., :-1]  # (SB, B, K)

    rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_samp, axis=-1)
    if white_bkgd:
        rgb = rgb + (1.0 - jnp.sum(weights, axis=-1, keepdims=True))
    return weights, rgb, depth


def composite(field_fn, rays, z_samp, white_bkgd: bool = False):
    """field_fn: (xyz (SB, N, 3), dirs (SB, N, 3)) -> (SB, N, 4) [rgb, sigma].

    rays: (SB, B, 8); z_samp: (SB, B, K) ascending.
    Returns (weights (SB, B, K), rgb (SB, B, 3), depth (SB, B)).
    """
    points, dirs = sample_points(rays, z_samp)
    out = field_fn(points, dirs)
    return composite_outputs(rays, z_samp, out, white_bkgd)
