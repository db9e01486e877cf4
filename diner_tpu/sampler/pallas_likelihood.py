"""Pallas TPU kernel: fused anchor-remap + surface-likelihood evaluation.

The epipolar-anchor sampler gathers (depth, std, normal) at A anchors per
(ray, view) group; each of the NC depth candidates then needs its nearest
anchor's values pushed through the likelihood math (erf probability mass of
N(depth, std^2) inside the candidate's depth bin, gated on front-facing
normals / depth window / valid sigma — reference:
src/models/nerf_renderer.py:122-180 in malteprinzler/diner).

Doing remap and likelihood as separate XLA stages materializes the
per-candidate (G, 5, NC) prior tensor in HBM (~650 MB/chunk at bench shapes)
and runs ~15 elementwise passes over (NV, NR, NC) tensors. This kernel keeps
everything in VMEM: it builds the (A, NC) one-hot from iota+compare (TPU
Pallas cannot gather), contracts it on the MXU in f32 (exact selection — one
f32 term per candidate, no bf16 rounding of depths), and evaluates the gated
erf-bin mass in-register. Only the (G, NC) likelihood leaves the kernel.

erf is not lowerable in Pallas TPU (KernelType.TC), so the kernel uses the
Abramowitz & Stegun 7.1.26 rational polynomial (max abs err ~2e-6 — two
orders below the likelihood scale that matters for top-k candidate ranking).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT2 = math.sqrt(2.0)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 erf approximation (max abs err ~2e-6)."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    y = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
        + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - y * jnp.exp(-ax * ax))


def _likelihood_kernel(a_ref, vals_ref, z_ref, hs_ref, o_ref, *, tg: int,
                       depth_diff_max: float):
    """a: (TG, NC) int32 anchor ids; vals: (TG, 3, A) f32 [depth, std, cos];
    z: (TG, NC) f32 cam-space candidate depth; hs: (TG, 1) f32 half bin step;
    out: (TG, NC) f32 likelihood."""
    A = vals_ref.shape[-1]
    NC = a_ref.shape[-1]
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, NC), 0)
    # Per-group one-hot remap on the MXU; exact selection is required: the
    # MXU's default f32 path multiplies in bf16, quantizing the selected
    # depths (~0.4%), which flips the |d - z| < ddm gate near its boundary
    # (observed on v5e). Precision.HIGHEST fixes that but pays 6 bf16
    # passes (3x3 chunk products). The one-hot operand is exactly
    # representable in ONE bf16 term, so a manual 3-way bf16 split of the
    # vals operand alone reproduces HIGHEST bitwise (the cross terms it
    # would add are exactly zero) at 3 passes: each partial product selects
    # one bf16 chunk exactly (one nonzero term per candidate, f32
    # accumulation), and v1+v2+v3 reconstructs f32 exactly (8+8+8 mantissa
    # bits). Mosaic rejects per-operand precision tuples, hence the split.
    dims = (((1,), (0,)), ((), ()))
    rows_d, rows_s, rows_c = [], [], []
    for g in range(tg):
        onehot = (iota_a == a_ref[g, :][None, :]).astype(jnp.bfloat16)
        v = vals_ref[g]
        v1 = v.astype(jnp.bfloat16)
        r1 = v - v1.astype(jnp.float32)
        v2 = r1.astype(jnp.bfloat16)
        v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
        # One (9, A) x (A, NC) dot instead of three (3, A) dots: the three
        # bf16 chunks stack along M (the MXU's under-used sublane dim), so
        # the remap costs one pass set instead of three. Summing the three
        # (3, NC) row blocks in f32 afterwards is bitwise the same as
        # summing three separate f32-accumulated dots.
        v9 = jnp.concatenate([v1, v2, v3], axis=0)  # (9, A) bf16
        d9 = jax.lax.dot_general(v9, onehot, dims,
                                 preferred_element_type=jnp.float32)
        dsc = d9[0:3] + d9[3:6] + d9[6:9]  # (3, NC) f32
        rows_d.append(dsc[0:1])
        rows_s.append(dsc[1:2])
        rows_c.append(dsc[2:3])
    # Batch the elementwise tail across the tile: per-group (1, NC) rows use
    # one sublane of eight, so running gates/erf per group leaves 7/8 of the
    # VPU idle — measured as the kernel's dominant cost (~3 of 4.3 ms).
    # Concatenating to (tg, NC) restores full sublane utilization.
    d = jnp.concatenate(rows_d, axis=0)    # (tg, NC)
    std = jnp.concatenate(rows_s, axis=0)
    cos = jnp.concatenate(rows_c, axis=0)
    z = z_ref[...]                          # (tg, NC)
    hs = hs_ref[...]                        # (tg, 1)
    valid = (cos <= 0.0) & (jnp.abs(d - z) < depth_diff_max) & (std != 0.0)
    sstd = jnp.where(std == 0.0, 1.0, std) * _SQRT2
    hi = _erf((z + hs - d) / sstd)
    lo = _erf((z - hs - d) / sstd)
    o_ref[...] = jnp.where(valid, 0.5 * jnp.abs(hi - lo), 0.0)


@functools.partial(jax.jit,
                   static_argnames=("depth_diff_max", "tg", "interpret"))
def likelihood_from_anchors(a, vals, z_cam, half_step, depth_diff_max: float,
                            tg: int = 8, interpret: bool = False):
    """Fused anchor remap + erf-bin surface likelihood.

    a: (G, NC) int32 anchor ids in [0, A); vals: (G, 3, A) f32 packed
    [anchor_depth, anchor_std, anchor_cos]; z_cam: (G, NC) f32; half_step:
    (G, 1) f32 (half the candidate bin width along the ray, per group).
    Returns p: (G, NC) f32 — the gated probability mass, equal (to ~2e-6,
    the erf polynomial) to remapping the anchors per-candidate and running
    the XLA likelihood math.
    """
    G, NC = a.shape
    Gp = -(-G // tg) * tg
    if Gp != G:
        a = jnp.pad(a, ((0, Gp - G), (0, 0)))
        vals = jnp.pad(vals, ((0, Gp - G), (0, 0), (0, 0)))
        z_cam = jnp.pad(z_cam, ((0, Gp - G), (0, 0)))
        half_step = jnp.pad(half_step, ((0, Gp - G), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_likelihood_kernel, tg=tg,
                          depth_diff_max=depth_diff_max),
        out_shape=jax.ShapeDtypeStruct((Gp, NC), jnp.float32),
        grid=(Gp // tg,),
        in_specs=[
            pl.BlockSpec((tg, NC), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, 3, vals.shape[-1]), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, NC), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tg, NC), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, vals, z_cam, half_step)
    return out[:G]
