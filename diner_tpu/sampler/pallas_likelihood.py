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


def _chord_kernel(z_ref, scal_ref, vals_ref, o_ref, *, tg: int,
                  n_anchors: int, depth_diff_max: float, lo_w: int):
    """Fused chord-arithmetic + two-level remap + gated erf-bin likelihood.

    z: (1, tg, NC) f32 candidate distances along the ray (view-independent);
    scal: (1, 1, tg, 8) f32 per-(view, ray) chord scalars
      [w0, w1, P0, P1, inv_dd, dd_ok, chord_ok, half_step];
    vals: (1, 1, tg, 9*lo_w, A/lo_w) bf16 — the anchor [depth, std, cos]
      table pre-split into three bf16 chunks and pre-arranged by the caller
      as rows (chunk*3 + channel)*lo_w + lo, columns hi (see
      likelihood_from_chord);
    out: (1, 1, tg, NC) f32 gated likelihood (the `front` z_cam>0 gate and
    the chord-validity gate are folded in — the caller's output is final up
    to the max-over-views).

    Anchor ids and cam depths are computed IN-REGISTER from the rational-
    linear chord parameterization (depth_guided.surface_likelihoods' closed
    form) — the (G, NC) id/z_cam tensors never touch HBM.

    The remap uses a two-level one-hot factorization: a = lo_w*hi + lo with
    hi in [0, A/lo_w), lo in [0, lo_w). Indicator build costs
    (A/lo_w + lo_w)*NC compares instead of A*NC (5x fewer VPU ops at
    A=96/lo_w=8 — the single-level build dominated kernel v1's runtime).
    The hi contraction runs on the MXU with the 3-way bf16 split of the
    value operand (see _likelihood_kernel's exactness argument: every
    partial sum has exactly ONE nonzero term, so bf16 chunk products
    accumulate to the exact f32 value); the lo contraction is an
    8-term VPU select, also one nonzero term per candidate — the selected
    (depth, std, cos) are therefore bit-exact f32, preserving the
    |d - z| < ddm gate behavior certified on v5e.
    """
    A = n_anchors
    HI = A // lo_w
    NC = z_ref.shape[-1]
    z = z_ref[0]                    # (tg, NC)
    sc = scal_ref[0, 0]             # (tg, 8)
    w0, w1 = sc[:, 0:1], sc[:, 1:2]
    P0, P1 = sc[:, 2:3], sc[:, 3:4]
    inv_dd, dd_ok = sc[:, 4:5], sc[:, 5:6]
    chord_ok, hs = sc[:, 6:7], sc[:, 7:8]

    zc = w0 + z * w1                                   # (tg, NC) cam depth
    front = (chord_ok > 0.0) & (zc > 1e-9)
    zc_safe = jnp.where(jnp.abs(zc) > 1e-9, zc, 1.0)
    t = (P0 + z * P1) * inv_dd / zc_safe
    s = jnp.where(dd_ok > 0.0, t, 0.5)
    a = jnp.clip((jnp.clip(s, 0.0, 1.0) * A).astype(jnp.int32), 0, A - 1)
    a_hi = a // lo_w                                    # (tg, NC)
    a_lo = a - a_hi * lo_w

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (HI, NC), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (lo_w, NC), 0)
    dims = (((1,), (0,)), ((), ()))
    rows = []
    for g in range(tg):
        oh_hi = (iota_hi == a_hi[g, :][None, :]).astype(jnp.bfloat16)
        # vals arrives PRE-ARRANGED as (9*lo_w, HI) bf16 per group (the
        # 3-way bf16 split + (chunk*3+channel, lo, hi) layout is built by
        # the XLA caller — Mosaic cannot shape-cast the lane dim in-kernel).
        v9 = vals_ref[0, 0, g]                           # (9*lo_w, HI) bf16
        thi = jax.lax.dot_general(v9, oh_hi, dims,
                                  preferred_element_type=jnp.float32)
        # sum the three bf16 chunks: rows are (chunk*3 + channel)*lo_w + lo,
        # so each chunk occupies a contiguous 3*lo_w row band
        t24 = (thi[0:3 * lo_w] + thi[3 * lo_w:6 * lo_w]
               + thi[6 * lo_w:9 * lo_w])                 # (3*lo_w, NC) f32
        # lo contraction: one-nonzero-term select on the VPU
        sel = (iota_lo == a_lo[g, :][None, :]).astype(jnp.float32)
        dsc = [jnp.sum(t24[c * lo_w:(c + 1) * lo_w] * sel, axis=0,
                       keepdims=True) for c in range(3)]  # 3 x (1, NC)
        rows.append(dsc)
    d = jnp.concatenate([r[0] for r in rows], axis=0)     # (tg, NC)
    std = jnp.concatenate([r[1] for r in rows], axis=0)
    cos = jnp.concatenate([r[2] for r in rows], axis=0)

    valid = front & (cos <= 0.0) & (jnp.abs(d - zc) < depth_diff_max) \
        & (std != 0.0)
    sstd = jnp.where(std == 0.0, 1.0, std) * _SQRT2
    hi_m = _erf((zc + hs - d) / sstd)
    lo_m = _erf((zc - hs - d) / sstd)
    o_ref[0, 0] = jnp.where(valid, 0.5 * jnp.abs(hi_m - lo_m), 0.0)


@functools.partial(jax.jit, static_argnames=("n_anchors", "depth_diff_max",
                                             "tg", "lo_w", "interpret"))
def likelihood_from_chord(z, scal, vals, n_anchors: int,
                          depth_diff_max: float, tg: int = 8, lo_w: int = 8,
                          interpret: bool = False):
    """Fused chord likelihood. z: (SB, NR, NC) f32; scal: (SB, NV, NR, 8)
    f32 chord scalars (see _chord_kernel); vals: (SB, NV, NR, 3, A) f32.
    Returns (SB, NV, NR, NC) f32 gated likelihood (front gate folded in).
    NR is padded to a multiple of tg internally."""
    SB, NV, NR, _, A = vals.shape
    assert A == n_anchors and A % lo_w == 0
    HI = A // lo_w
    NC = z.shape[-1]
    NRp = -(-NR // tg) * tg
    if NRp != NR:
        z = jnp.pad(z, ((0, 0), (0, NRp - NR), (0, 0)))
        scal = jnp.pad(scal, ((0, 0), (0, 0), (0, NRp - NR), (0, 0)))
        vals = jnp.pad(vals, ((0, 0), (0, 0), (0, NRp - NR), (0, 0), (0, 0)))

    # 3-way bf16 split + (chunk*3+channel, lo, hi) layout, built here in XLA
    # (Mosaic rejects lane-dim shape casts in-kernel). Each of v1/v2/v3 is
    # exactly representable in one bf16 term per selected anchor, so the
    # kernel's f32 chunk-sum reconstructs the exact f32 value (see kernel
    # docstring).
    v1 = vals.astype(jnp.bfloat16)
    r1 = vals - v1.astype(jnp.float32)
    v2 = r1.astype(jnp.bfloat16)
    v3 = (r1 - v2.astype(jnp.float32)).astype(jnp.bfloat16)
    v9 = jnp.concatenate([v1, v2, v3], axis=3)           # (SB,NV,NR,9,A)
    v9 = v9.reshape(SB, NV, NRp, 9, HI, lo_w) \
           .transpose(0, 1, 2, 3, 5, 4) \
           .reshape(SB, NV, NRp, 9 * lo_w, HI)

    out = pl.pallas_call(
        functools.partial(_chord_kernel, tg=tg, n_anchors=A,
                          depth_diff_max=depth_diff_max, lo_w=lo_w),
        out_shape=jax.ShapeDtypeStruct((SB, NV, NRp, NC), jnp.float32),
        grid=(SB, NV, NRp // tg),
        in_specs=[
            pl.BlockSpec((1, tg, NC), lambda b, v, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tg, 8), lambda b, v, j: (b, v, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tg, 9 * lo_w, HI),
                         lambda b, v, j: (b, v, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tg, NC), lambda b, v, j: (b, v, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(z, scal, v9)
    return out[:, :, :NR]
