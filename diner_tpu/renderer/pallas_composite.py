"""Fused alpha-compositing as a Pallas TPU kernel.

Behavioral reference: the quadrature in src/models/nerf_renderer.py:286-365 of
malteprinzler/diner (see also diner_tpu.renderer.composite, the XLA version
this kernel is validated against).

Why a kernel: the XLA composite materializes several (B, K) intermediates
(deltas, alphas, the shifted-cumprod transmittance chain, weights) in HBM
between fusions. Here one kernel keeps a ray block's chain entirely in VMEM:
the exclusive transmittance product is a K-step running product carried in
registers while rgb/depth/weight-sum accumulators update in place — one HBM
read of (z, sigma, rgb) and one write of the outputs per ray.

The per-element gather-heavy stages (sampler, feature fetch) cannot be Pallas
on TPU (no per-lane int indexing); compositing is the piece of the ray
pipeline that fuses cleanly. Numerical semantics match `composite` exactly
(same 1e-10 stabilizer, last delta = far - z_K, optional white background).

Status: compiled + validated bit-near on v5e, and measured IN-PROGRAM inside
the full bench render (round 2): swapping it for the XLA composite changes
the image by <5e-7 but is ~2% slower end-to-end (1.608 vs 1.579 s/frame at
n_prior_anchors=128) — XLA already fuses the alpha chain into the field-MLP
epilogue, and the kernel's channel-split layout forces an extra
materialization of field_out. Kept as a validated alternative (and as
groundwork for a future fused field-epilogue kernel), not the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 512  # rays per kernel invocation


def _composite_kernel(z_ref, sigma_ref, r_ref, g_ref, b_ref, far_ref, out_ref,
                      *, K: int, white_bkgd: bool):
    """Blocks: z/sigma/r/g/b (B, K); far (B, 1); out (B, 8)
    [rgb 3 | depth 1 | acc 1 | pad 3]. RGB is channel-split into (B, K)
    planes: a (B, K, 3) block would lane-pad 3 -> 128 in VMEM (42x waste)."""
    z = z_ref[:]                 # (B, K)
    sigma = jnp.maximum(sigma_ref[:], 0.0)

    deltas = jnp.concatenate([z[:, 1:] - z[:, :-1],
                              far_ref[:] - z[:, -1:]], axis=1)  # (B, K)
    alphas = 1.0 - jnp.exp(-deltas * sigma)

    # exclusive transmittance cumprod + weighted reductions, all in VMEM.
    # Mosaic lowers neither cumprod nor dynamic_slice: use a Hillis-Steele
    # prefix product with static shifts (log2(K) vectorized steps).
    B = z.shape[0]
    trans = jnp.concatenate(
        [jnp.ones((B, 1), z.dtype), (1.0 - alphas + 1e-10)[:, :-1]], axis=1)
    offset = 1
    while offset < K:
        shifted_in = jnp.concatenate(
            [jnp.ones((B, offset), z.dtype), trans[:, :K - offset]], axis=1)
        trans = trans * shifted_in
        offset *= 2
    weights = alphas * trans               # (B, K)
    rgb_out = jnp.concatenate(
        [jnp.sum(weights * c_ref[:], axis=1, keepdims=True)
         for c_ref in (r_ref, g_ref, b_ref)], axis=1)  # (B, 3)
    depth_out = jnp.sum(weights * z, axis=1, keepdims=True)
    w_out = jnp.sum(weights, axis=1, keepdims=True)
    if white_bkgd:
        rgb_out = rgb_out + (1.0 - w_out)
    out_ref[:] = jnp.concatenate(
        [rgb_out, depth_out, w_out, jnp.zeros((B, 3), z.dtype)], axis=1)


def composite_pallas(rays, z_samp, field_out, white_bkgd: bool = False,
                     block: int = DEFAULT_BLOCK, interpret: bool = False):
    """Fused compositing over precomputed field outputs.

    rays: (SB, B, 8); z_samp: (SB, B, K) ascending; field_out: (SB, B, K, 4)
    [rgb, sigma]. Returns (rgb (SB, B, 3), depth (SB, B), acc (SB, B)).
    """
    SB, B, K = z_samp.shape
    n_pad = (-B) % block
    if n_pad:
        pad = lambda a: jnp.concatenate(
            [a, jnp.broadcast_to(a[:, -1:], (SB, n_pad, *a.shape[2:]))], axis=1)
        z_samp, field_out, rays = pad(z_samp), pad(field_out), pad(rays)
    Bp = B + n_pad

    z2 = z_samp.reshape(SB * Bp, K)
    sigma2 = field_out[..., 3].reshape(SB * Bp, K)
    r2 = field_out[..., 0].reshape(SB * Bp, K)
    g2 = field_out[..., 1].reshape(SB * Bp, K)
    b2 = field_out[..., 2].reshape(SB * Bp, K)
    far2 = rays[..., 7:8].reshape(SB * Bp, 1)

    grid = (SB * Bp) // block
    kernel = functools.partial(_composite_kernel, K=K, white_bkgd=white_bkgd)
    bk_spec = pl.BlockSpec((block, K), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[bk_spec, bk_spec, bk_spec, bk_spec, bk_spec,
                  pl.BlockSpec((block, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((block, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SB * Bp, 8), z2.dtype),
        interpret=interpret,
    )(z2, sigma2, r2, g2, b2, far2)

    out = out.reshape(SB, Bp, 8)[:, :B]
    return out[..., :3], out[..., 3], out[..., 4]
