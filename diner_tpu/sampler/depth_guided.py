"""Depth-guided ray sampling — DINER's core contribution, as static-shape XLA.

Behavioral reference: src/models/nerf_renderer.py:39-397 in malteprinzler/diner
(sample_coarse, sample_depthguided, fill_up_uniform_samples).

Pipeline per ray (all shapes static; no data-dependent control flow):
  1. `n_candidates` stratified z candidates in [near, far].
  2. Project every candidate into every source view; gather MVS depth d,
     depth-std sigma (exponentially extrapolated outside the image) and normal.
  3. Surface likelihood p = probability mass of N(d, sigma^2) inside the
     candidate's depth bin (erf difference), gated on front-facing normals,
     |d - z_cam| < depth_diff_max, and valid sigma; max over views.
  4. Occlusion-aware variant multiplies by transmittance cumprod(1 - p).
  5. top-k candidates by likelihood (zero-likelihood slots marked empty z=0).
  6. Last `n_gaussian` slots resampled from N(mu, sigma) fitted to the
     occlusion-aware likelihood mass along the ray.
  7. Empty slots refilled stratified-uniformly; final z sorted ascending.

The reference's boolean-mask scatters become jnp.where + fixed-size sorts
(SURVEY.md §7.3); distribution parity is preserved, bit-parity of randomness
is not required.

Steps 2-3 have two implementations: the exact per-candidate gather path
(reference semantics; also the prior_stride variant) and the epipolar-anchor
fast path (RenderConfig.n_prior_anchors): priors are gathered at A points on
each (ray, view)'s epipolar chord, anchor ids and cam depths come from the
closed-form rational-linear uv(z) (a handful of per-ray scalars — no
NV x NR x NC point pipeline), and a fused Pallas kernel
(pallas_likelihood.py) does the one-hot remap + gated erf mass in VMEM.
Anchor spacing stays within the reference's own +-0.5 px nearest-pixel
quantization for chords shorter than 2A px.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import erf

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.geometry import transform_points, project_points


class EpiAnchors(NamedTuple):
    """Per-(view, ray) epipolar-anchor state produced by the sampler and
    reusable by the field (RenderConfig.anchor_field_depth): the chord
    parameterization plus the anchor depth table. All candidates AND all
    final z samples of a ray project onto the same epipolar segment, so any
    later point can be mapped to its nearest anchor with pure arithmetic —
    no further image gathers."""

    uv0: jnp.ndarray    # (SB, NV, NR, 2) chord start (first candidate's uv)
    duv: jnp.ndarray    # (SB, NV, NR, 2) chord vector (last - first)
    dd: jnp.ndarray     # (SB, NV, NR) squared chord length
    depth: jnp.ndarray  # (SB, NV, NR, A) anchor depth values


def sample_stratified(rng, rays, n: int):
    """Stratified z samples in [near, far]: one uniform draw per bin.

    rays: (..., 8). Returns (..., n).
    """
    near, far = rays[..., 6:7], rays[..., 7:8]
    steps = jnp.arange(n, dtype=rays.dtype) / n  # (n,) in [0, 1)
    jitter = jax.random.uniform(rng, (*rays.shape[:-1], n), rays.dtype) / n
    s = steps + jitter
    return near * (1 - s) + far * s


def gather_priors(enc: SceneEncoding, uv, pad: int = 100,
                  double_width: float = 12.0):
    """Fused single-gather fetch of (depth, std, normal) at nearest pixels.

    Exactly equivalent to index_depth (nearest/border) + index_depth_std
    (nearest/exponential, pad=100, dw=12) + index_normal (nearest/zeros), but
    one packed (H, W, 5) gather instead of three — the three modes share the
    same nearest pixel (the exponential path's padded-grid quantization is an
    exact integer shift of the plain one), and differ only in a per-mode
    mask/scale computed from the integer index. ~3x sampler speedup on TPU,
    where the gather unit dominates this path.

    uv: (SB, NV, N, 2). Returns (depth (SB,NV,N), std (SB,NV,N),
    normal (SB,NV,N,3)).
    """
    SB, NV, H, W, _ = enc.depths.shape
    N = uv.shape[-2]
    packed = jnp.concatenate([enc.depths, enc.depth_stds, enc.normals], -1)
    flat = packed.reshape(SB * NV * H * W, 5)

    ix = (uv[..., 0] + 1.0) * 0.5 * W - 0.5
    iy = (uv[..., 1] + 1.0) * 0.5 * H - 0.5
    jx = jnp.round(ix).astype(jnp.int32)
    jy = jnp.round(iy).astype(jnp.int32)
    idx = (jnp.clip(jy, 0, H - 1) * W + jnp.clip(jx, 0, W - 1)).reshape(SB * NV, N)
    # one flat global gather (~25% faster than the batched take_along_axis
    # formulation on v5e: a single unbatched row-gather tiles better)
    gidx = (idx + (jnp.arange(SB * NV, dtype=jnp.int32) * (H * W))[:, None]
            ).reshape(-1)
    vals = jnp.take(flat, gidx, axis=0, mode="clip").reshape(SB, NV, N, 5)

    inside = (jx >= 0) & (jx < W) & (jy >= 0) & (jy < H)
    dx = jnp.maximum(jnp.maximum(-jx - 1, jx - W), 0)
    dy = jnp.maximum(jnp.maximum(-jy - 1, jy - H), 0)
    d = jnp.maximum(dx, dy).astype(vals.dtype)
    within_pad = (jx >= -pad) & (jx < W + pad) & (jy >= -pad) & (jy < H + pad)
    std_scale = jnp.exp2(d / double_width) * within_pad.astype(vals.dtype)

    depth = vals[..., 0]
    std = vals[..., 1] * std_scale
    normal = vals[..., 2:5] * inside[..., None].astype(vals.dtype)
    return depth, std, normal


def _remap_monotone(vals, a, method: str = "take"):
    """Expand per-anchor values to per-candidate: out[..., t, :] = vals[..., a[..., t], :].

    vals: (..., K, C); a: (..., NC) int32 in [0, K). `a` is monotone along the
    epipolar chord. "take" lowers to a small-table batched gather; "dot" is an
    MXU one-hot matmul (measure on target hardware; the one-hot operand is
    materialized by XLA, so it trades HBM traffic for gather-unit pressure).
    """
    if method == "take":
        return jnp.take_along_axis(vals, a[..., None], axis=-2)
    K = vals.shape[-2]
    onehot = a[..., None] == jnp.arange(K, dtype=a.dtype)
    return jnp.einsum("...tk,...kc->...tc",
                      onehot.astype(jnp.bfloat16),
                      vals.astype(jnp.bfloat16)).astype(vals.dtype)


def anchor_ids(uv, uv0, duv, dd, n_anchors: int):
    """Nearest-anchor ids for points `uv` on the chord (uv0, duv, dd).

    uv: (..., N, 2); uv0/duv: (..., 2); dd: (...). Returns (..., N) int32.
    """
    t = jnp.sum((uv - uv0[..., None, :]) * duv[..., None, :], axis=-1)
    dd = dd[..., None]
    s = jnp.where(dd > 1e-12, t / jnp.where(dd == 0, 1.0, dd), 0.5)
    return jnp.clip((jnp.clip(s, 0.0, 1.0) * n_anchors).astype(jnp.int32),
                    0, n_anchors - 1)


def _gather_anchor_priors(enc: SceneEncoding, uv0, duv, n_anchors: int):
    """Gather (depth, std, normal) at `n_anchors` points spaced uniformly
    along each chord. Returns (depth (SB,NV,NR,A), std (SB,NV,NR,A),
    normal (SB,NV,NR,A,3)). Anchor-spacing error vs per-point gathers is
    <= chord_px / (2 * n_anchors) pixels (RenderConfig.n_prior_anchors)."""
    SB, NV, NR, _ = uv0.shape
    A = n_anchors
    frac = ((jnp.arange(A, dtype=uv0.dtype) + 0.5) / A)[:, None]  # (A, 1)
    uv_anchor = uv0[..., None, :] + frac * duv[..., None, :]  # (SB,NV,NR,A,2)
    ad, astd, anrm = gather_priors(enc, uv_anchor.reshape(SB, NV, NR * A, 2))
    return (ad.reshape(SB, NV, NR, A), astd.reshape(SB, NV, NR, A),
            anrm.reshape(SB, NV, NR, A, 3))


def _gather_anchor_priors_paired(enc: SceneEncoding, uv0, duv,
                                 n_anchors: int):
    """Paired-anchor prior fetch: one packed 2x2-quad row per TWO
    consecutive anchors (RenderConfig.paired_prior_gather).

    The v5e gather engine is row-rate-bound (PERFORMANCE.md "Gather
    floor"), so fetching A/2 rows of the quad-packed (H-1, W-1, 20) prior
    table instead of A rows of the (H, W, 5) one halves the dominant
    anchor-gather cost. Each anchor of a pair then SELECTS its own nearest
    pixel from the quad around the pair midpoint with pure arithmetic —
    bit-identical to gather_priors whenever both nearest pixels fall
    inside the midpoint quad (anchor spacing <= 1 px per axis); longer
    chords clamp into the quad (error <= spacing/2 - 0.5 px, the anchor
    discretization's own error class). The per-anchor mask/scale math
    (border distance, exponential std window, inside-image normal zeroing)
    is identical to gather_priors — it depends only on each anchor's own
    integer pixel, which never touches memory.

    Returns the same (depth, std, normal) layout as _gather_anchor_priors.
    """
    SB, NV, NR, _ = uv0.shape
    A = n_anchors
    assert A % 2 == 0, "paired_prior_gather needs an even anchor count"
    H, W = enc.depths.shape[2:4]
    pad, double_width = 100, 12.0

    # pair midpoints and per-anchor positions along the chord
    frac_mid = ((2.0 * jnp.arange(A // 2, dtype=uv0.dtype) + 1.0) / A)[:, None]
    frac_all = ((jnp.arange(A, dtype=uv0.dtype) + 0.5) / A)[:, None]
    uv_mid = uv0[..., None, :] + frac_mid * duv[..., None, :]  # (...,A/2,2)
    uv_all = uv0[..., None, :] + frac_all * duv[..., None, :]  # (...,A,2)

    # 2x2-packed BF16 table: T[y, x] = packed6[(y,x), (y,x+1), (y+1,x),
    # (y+1,x+1)], 6 bf16 channels per pixel = 48-byte rows. The v5e gather
    # engine fetches bf16 rows at ~295M rows/s INDEPENDENT of width up to
    # 48B, vs 204M rows/s for 20B f32 rows and 32M rows/s for 80B f32 rows
    # (results/gather_width_r5.json) — so the bf16 quad table is ~3x the
    # f32 row throughput on HALF the rows. Depth keeps (near-)f32 precision
    # via a 2-way bf16 hi/lo split (|err| <= ~2^-17 relative — two orders
    # below the bf16 compute path already certified); std/normal round to
    # bf16, the same precision class as compute_dtype="bfloat16".
    d32 = enc.depths.astype(jnp.float32)
    d_hi = d32.astype(jnp.bfloat16)
    d_lo = (d32 - d_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    packed6 = jnp.concatenate(
        [d_hi, d_lo, enc.depth_stds.astype(jnp.bfloat16),
         enc.normals.astype(jnp.bfloat16)], -1)        # (SB,NV,H,W,6) bf16
    pq = jnp.concatenate([packed6[:, :, :-1, :-1], packed6[:, :, :-1, 1:],
                          packed6[:, :, 1:, :-1], packed6[:, :, 1:, 1:]], -1)
    flat = pq.reshape(SB * NV * (H - 1) * (W - 1), 24)

    def _pix(uv):
        ix = (uv[..., 0] + 1.0) * 0.5 * W - 0.5
        iy = (uv[..., 1] + 1.0) * 0.5 * H - 0.5
        return ix, iy

    ix_m, iy_m = _pix(uv_mid.reshape(SB, NV, NR * (A // 2), 2))
    x0 = jnp.clip(jnp.floor(ix_m).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(iy_m).astype(jnp.int32), 0, H - 2)
    idx = (y0 * (W - 1) + x0).reshape(SB * NV, NR * (A // 2))
    gidx = (idx + (jnp.arange(SB * NV, dtype=jnp.int32)
                   * ((H - 1) * (W - 1)))[:, None]).reshape(-1)
    rows = jnp.take(flat, gidx, axis=0, mode="clip") \
              .reshape(SB, NV, NR, A // 2, 4, 6)

    # per-anchor nearest pixel (the SAME formula as gather_priors), kept in
    # pair-major shape (..., A/2, 2) so the quad-slot select BROADCASTS the
    # gathered rows across the pair instead of materializing a repeated
    # (..., A, 4, 5) tensor (a jnp.repeat here measured ~250 MB/chunk of
    # pure HBM traffic and erased the pairing's gather savings)
    P = A // 2
    ix, iy = _pix(uv_all.reshape(SB, NV, NR * A, 2))
    jx = jnp.round(ix).astype(jnp.int32)
    jy = jnp.round(iy).astype(jnp.int32)
    jxc = jnp.clip(jx, 0, W - 1).reshape(SB, NV, NR, P, 2)
    jyc = jnp.clip(jy, 0, H - 1).reshape(SB, NV, NR, P, 2)
    x0p = x0.reshape(SB, NV, NR, P)[..., None]         # (SB,NV,NR,P,1)
    y0p = y0.reshape(SB, NV, NR, P)[..., None]
    sx = jnp.clip(jxc - x0p, 0, 1)
    sy = jnp.clip(jyc - y0p, 0, 1)
    q = (sy * 2 + sx)[..., None]                       # (SB,NV,NR,P,2,1)
    # 4-way VPU select (NOT take_along_axis — that would lower to another
    # row-per-anchor gather and give back everything the pairing saved);
    # rows[..., k, :] (..., P, 6) broadcasts against q (..., P, 2, 1).
    # Select in bf16, reconstruct f32 afterwards (one nonzero term each).
    vals = sum(jnp.where(q == k, rows[..., k, None, :],
                         jnp.bfloat16(0.0))
               for k in range(4)).reshape(SB, NV, NR, A, 6)

    jx = jx.reshape(SB, NV, NR, A)
    jy = jy.reshape(SB, NV, NR, A)
    inside = (jx >= 0) & (jx < W) & (jy >= 0) & (jy < H)
    dx = jnp.maximum(jnp.maximum(-jx - 1, jx - W), 0)
    dy = jnp.maximum(jnp.maximum(-jy - 1, jy - H), 0)
    d = jnp.maximum(dx, dy).astype(vals.dtype)
    within_pad = (jx >= -pad) & (jx < W + pad) & (jy >= -pad) & (jy < H + pad)
    std_scale = jnp.exp2(d / double_width) * within_pad.astype(vals.dtype)

    depth = (vals[..., 0].astype(jnp.float32)
             + vals[..., 1].astype(jnp.float32))    # bf16 hi/lo -> ~f32
    std = vals[..., 2].astype(jnp.float32) * std_scale
    normal = (vals[..., 3:6].astype(jnp.float32)
              * inside[..., None].astype(jnp.float32))
    return depth, std, normal


def surface_likelihoods(rays, z, enc: SceneEncoding, depth_diff_max: float,
                        prior_stride: int = 1, n_prior_anchors: int = 0,
                        paired_prior_gather: bool = False,
                        return_aux: bool = False):
    """Per-candidate surface likelihoods from the MVS depth priors.

    rays: (SB, NR, 8); z: (SB, NR, NC) distances along the (unit) ray dirs.
    prior_stride > 1 gathers priors only every stride-th candidate and shares
    them within the group (RenderConfig.prior_stride rationale).
    n_prior_anchors > 0 uses the epipolar-anchor fetch instead (see
    RenderConfig.n_prior_anchors; mutually exclusive with prior_stride > 1).
    Returns (p, opaque_p), each (SB, NR, NC): raw max-over-views likelihood and
    its occlusion-aware (transmittance-weighted) variant. With
    return_aux=True, returns (p, opaque_p, aux) where aux is the EpiAnchors
    state (None unless anchors are on) for reuse by the field.
    """
    SB, NR, NC = z.shape
    NV = enc.poses.shape[1]
    B = NR * NC
    s = prior_stride
    assert NC % s == 0
    assert not (s > 1 and n_prior_anchors), \
        "prior_stride and n_prior_anchors are mutually exclusive"

    dirs = jnp.broadcast_to(rays[:, None, :, 3:6], (SB, NV, NR, 3))
    dirs_cam = jnp.einsum("svij,svrj->svri", enc.poses[..., :3, :3], dirs)
    aux = None

    if n_prior_anchors:
        # Per-(view, ray) closed form instead of a 33M-point pipeline: the
        # camera-space point along one ray is o_cam + z*d_cam (linear in z),
        # so its normalized projection is rational-linear,
        # uv(z) = (U0 + z*U1) / z_cam(z), and the chord parameter collapses
        # to s(z) = (P0 + P1*z) / (dd * z_cam(z)) with per-ray scalars
        # P0/P1. Anchor ids and cam depths for every candidate then cost a
        # few fused VPU ops each — transform_points/project_points over
        # (NV, NR, NC) points never materialize.
        A = n_prior_anchors
        o_nv = jnp.broadcast_to(rays[:, None, :, :3], (SB, NV, NR, 3))
        o_cam = transform_points(enc.poses, o_nv)      # (SB, NV, NR, 3)
        wh = jnp.asarray(enc.image_shape, rays.dtype)  # (2,) [W, H]
        f2 = (enc.focal * 2.0 / wh)[:, :, None]        # (SB, NV, 1, 2)
        cterm = (enc.c * 2.0 / wh - 1.0)[:, :, None]
        U0 = o_cam[..., :2] * f2 + o_cam[..., 2:3] * cterm  # (SB, NV, NR, 2)
        U1 = dirs_cam[..., :2] * f2 + dirs_cam[..., 2:3] * cterm
        w0, w1 = o_cam[..., 2], dirs_cam[..., 2]       # (SB, NV, NR)

        z0, zL = z[:, None, :, 0], z[:, None, :, -1]   # (SB, NV, NR)
        den0, denL = w0 + z0 * w1, w0 + zL * w1
        # behind-camera guard: a chord endpoint with cam depth <= 0 has no
        # valid projection (the exact path's gather returns std=0 there via
        # out-of-pad uv); sanitize the chord so downstream int casts and
        # gathers see finite values, and gate p to 0 below
        chord_ok = (den0 > 1e-9) & (denL > 1e-9)       # (SB, NV, NR)
        uv0 = jnp.where(chord_ok[..., None],
                        (U0 + z0[..., None] * U1)
                        / jnp.where(den0 == 0, 1.0, den0)[..., None], 0.0)
        uvL = jnp.where(chord_ok[..., None],
                        (U0 + zL[..., None] * U1)
                        / jnp.where(denL == 0, 1.0, denL)[..., None], 0.0)
        duv = uvL - uv0
        dd = jnp.sum(duv * duv, axis=-1)               # (SB, NV, NR)
        P0 = jnp.sum((U0 - w0[..., None] * uv0) * duv, axis=-1)
        P1 = jnp.sum((U1 - w1[..., None] * uv0) * duv, axis=-1)

        # Issue the anchor gather BEFORE the (G, NC) chord arithmetic: the
        # gather engine runs asynchronously to the VPU, so ordering the 8 ms
        # gather first hides the ~3 ms of per-candidate chord math behind it
        # (measured +6% frame throughput at flagship shape,
        # results/stage_ab_r5.json vs results/decompose_likelihood_r4.json).
        if paired_prior_gather and A % 2 == 0:
            ad, astd, anrm = _gather_anchor_priors_paired(enc, uv0, duv, A)
        else:
            ad, astd, anrm = _gather_anchor_priors(enc, uv0, duv, A)
        aux = EpiAnchors(uv0=uv0, duv=duv, dd=dd, depth=ad)
        # the normal gate's cosine depends only on the anchor (the ray
        # direction is constant along the chord): fold it per-anchor so the
        # remap carries 3 channels [depth, std, cos] instead of 5
        acos = jnp.sum(dirs_cam[:, :, :, None, :] * anrm, axis=-1)
        from diner_tpu.utils.jitinit import use_tpu_kernels

        if use_tpu_kernels() and os.environ.get(
                "DINER_TPU_LIKELIHOOD", "v1") == "chord":
            # OPT-IN fused chord+likelihood kernel (r5 experiment): anchor
            # ids and cam depths computed in-register from the per-(view,
            # ray) chord scalars — the (G, NC) id / z_cam tensors never
            # touch HBM. Measured SLOWER end-to-end than the v1 kernel on
            # v5e (results/stage_ab_r5.json: stage 13.1 ms vs 9.8 ms,
            # frame 58.7k vs 62.0k rays/s): the (9*lo_w, A/lo_w) operand's
            # 12-lane minor dim pads to 128 lanes in VMEM, inflating the
            # per-block DMA ~10x. Kept for the record; the LOAD-BEARING r5
            # change is hoisting _gather_anchor_priors ABOVE the chord
            # arithmetic (below), which lets the async gather overlap the
            # (G, NC) VPU work and took the fast preset from 58.2k to
            # 62.0k rays/s on its own.
            from diner_tpu.sampler.pallas_likelihood import (
                likelihood_from_chord)

            half_step = ((rays[..., 7] - rays[..., 6]) / (2 * NC))  # (SB,NR)
            scal = jnp.stack([
                w0, w1, P0, P1,
                1.0 / jnp.where(dd == 0, 1.0, dd),
                (dd > 1e-12).astype(rays.dtype),
                chord_ok.astype(rays.dtype),
                jnp.broadcast_to(half_step[:, None], (SB, NV, NR)),
            ], axis=-1)                                   # (SB, NV, NR, 8)
            vals = jnp.stack([ad, astd, acos], axis=3)    # (SB,NV,NR,3,A)
            p = likelihood_from_chord(z, scal.astype(jnp.float32),
                                      vals.astype(jnp.float32), A,
                                      depth_diff_max)
            return _finish_likelihood(p, aux, return_aux)

        z_nv = z[:, None]                              # (SB, 1, NR, NC)
        z_cam = w0[..., None] + z_nv * w1[..., None]   # (SB, NV, NR, NC)
        front = chord_ok[..., None] & (z_cam > 1e-9)   # (SB, NV, NR, NC)
        z_cam_safe = jnp.where(jnp.abs(z_cam) > 1e-9, z_cam, 1.0)
        t = (P0[..., None] + z_nv * P1[..., None]) \
            / (z_cam_safe * jnp.where(dd == 0, 1.0, dd)[..., None])
        s_par = jnp.where(dd[..., None] > 1e-12, t, 0.5)
        a = jnp.clip((jnp.clip(s_par, 0.0, 1.0) * A).astype(jnp.int32),
                     0, A - 1)

        if use_tpu_kernels():
            # fused Pallas kernel: one-hot MXU remap (exact f32) + gated
            # erf-bin mass, all VMEM-resident — only (G, NC) leaves the chip
            from diner_tpu.sampler.pallas_likelihood import (
                likelihood_from_anchors)

            G = SB * NV * NR
            vals = jnp.stack([ad, astd, acos], axis=3)  # (SB, NV, NR, 3, A)
            half_step = ((rays[..., 7] - rays[..., 6]) / (2 * NC))  # (SB, NR)
            half_step = jnp.broadcast_to(half_step[:, None], (SB, NV, NR))
            p = likelihood_from_anchors(
                a.reshape(G, NC), vals.reshape(G, 3, A).astype(jnp.float32),
                z_cam.reshape(G, NC), half_step.reshape(G, 1),
                depth_diff_max)
            p = jnp.where(front, p.reshape(SB, NV, NR, NC), 0.0)
            return _finish_likelihood(p, aux, return_aux)
        # portable fallback (CPU tests, other backends): remap per candidate,
        # then the same XLA likelihood math as the exact path
        vals = jnp.stack([ad, astd, acos], axis=-1)  # (SB, NV, NR, A, 3)
        out = _remap_monotone(vals, a)
        ref_depth, ref_std, cos = out[..., 0], out[..., 1], out[..., 2]
        ref_std = jnp.where(front, ref_std, 0.0)  # std=0 -> invalid below
    else:
        xyz = rays[..., None, :3] + z[..., None] * rays[..., None, 3:6]
        xyz = xyz.reshape(SB, B, 3)
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SB, NV, B, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)  # (SB, NV, B, 3)
        uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)
        z_cam = xyz_cam[..., 2].reshape(SB, NV, NR, NC)
        if s > 1:
            uv = uv.reshape(SB, NV, NR, NC, 2)[:, :, :, ::s]
            uv = uv.reshape(SB, NV, NR * (NC // s), 2)
        ref_depth, ref_std, ref_normal = gather_priors(enc, uv)
        if s > 1:
            rep = lambda a: jnp.repeat(
                a.reshape(SB, NV, NR, NC // s, *a.shape[3:]), s, axis=3)
            ref_depth = rep(ref_depth[..., None])[..., 0]
            ref_std = rep(ref_std[..., None])[..., 0]
            ref_normal = rep(ref_normal)
        else:
            ref_depth = ref_depth.reshape(SB, NV, NR, NC)
            ref_std = ref_std.reshape(SB, NV, NR, NC)
            ref_normal = ref_normal.reshape(SB, NV, NR, NC, 3)
        cos = jnp.sum(dirs_cam[:, :, :, None, :] * ref_normal, axis=-1)

    step = ((rays[..., 7] - rays[..., 6]) / NC)[:, None, :, None]  # (SB,1,NR,1)

    valid = (cos <= 0) & (jnp.abs(ref_depth - z_cam) < depth_diff_max) & (ref_std != 0)

    safe_std = jnp.where(ref_std == 0, 1.0, ref_std) * math.sqrt(2.0)
    hi = erf((z_cam + step / 2 - ref_depth) / safe_std)
    lo = erf((z_cam - step / 2 - ref_depth) / safe_std)
    p = jnp.where(valid, 0.5 * jnp.abs(hi - lo), 0.0)  # (SB, NV, NR, NC)
    return _finish_likelihood(p, aux, return_aux)


def _finish_likelihood(p, aux, return_aux):
    """Max over views + occlusion transmittance, shared by both paths."""
    p = jnp.max(p, axis=1)  # (SB, NR, NC)
    # occlusion-aware: multiply by transmittance of all *earlier* candidates
    trans = jnp.cumprod(1.0 - p, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]],
                            axis=-1)
    if return_aux:
        return p, p * trans, aux
    return p, p * trans


def fill_uniform(rng, z, rays):
    """Refill empty (z==0) slots stratified-uniformly over [near, far].

    z: (SB, NR, K) (0 marks empty); rays: (SB, NR, 8).
    After ascending sort the empties occupy slots 0..n_missing-1; slot i gets
    near + (i + U(0,1)) * (far - near) / n_missing
    (reference fill_up_uniform_samples, nerf_renderer.py:367-397).
    Returns (SB, NR, K) sorted ascending.
    """
    SB, NR, K = z.shape
    z = jnp.sort(z, axis=-1)  # zeros first
    missing = z == 0
    n_missing = jnp.sum(missing, axis=-1, keepdims=True)  # (SB, NR, 1)
    near, far = rays[..., 6:7], rays[..., 7:8]
    step = (far - near) / jnp.maximum(n_missing, 1).astype(z.dtype)
    slot = jnp.arange(K, dtype=z.dtype)
    u = jax.random.uniform(rng, z.shape, z.dtype)
    z_fill = near + (slot + u) * step
    z = jnp.where(missing, z_fill, z)
    return jnp.sort(z, axis=-1)


def sample_depthguided(rng, rays, enc: SceneEncoding, cfg: RenderConfig,
                       return_aux: bool = False):
    """Full depth-guided sampling: (SB, NR, 8) rays -> (SB, NR, n_samples) z,
    sorted ascending, ready for compositing. No gradients flow through this
    (the reference runs it under no_grad); callers wrap in lax.stop_gradient.
    With return_aux=True also returns the EpiAnchors state (None unless
    cfg.n_prior_anchors) for anchor-based field depth lookup.
    """
    assert cfg.n_samples >= cfg.n_gaussian
    k_strat, k_gauss, k_fill = jax.random.split(rng, 3)

    z_cand = sample_stratified(k_strat, rays, cfg.n_depth_candidates)
    p, opaque, aux = surface_likelihoods(
        rays, z_cand, enc, cfg.depth_diff_max,
        prior_stride=cfg.prior_stride,
        n_prior_anchors=cfg.n_prior_anchors,
        paired_prior_gather=cfg.paired_prior_gather,
        return_aux=True)

    if cfg.approx_topk:
        top_p, top_idx = jax.lax.approx_max_k(p, cfg.n_samples)
    else:
        top_p, top_idx = jax.lax.top_k(p, cfg.n_samples)  # (SB, NR, K)
    z_sel = jnp.take_along_axis(z_cand, top_idx, axis=-1)
    z_sel = jnp.where(top_p == 0, 0.0, z_sel)  # empty slots -> refill later

    if cfg.n_gaussian > 0:
        from diner_tpu.utils import weighted_mean_and_std

        hit = jnp.any(opaque != 0, axis=-1, keepdims=True)  # (SB, NR, 1)
        mean, std = weighted_mean_and_std(z_cand, opaque, axis=-1,
                                          keepdims=True)
        g = jax.random.normal(k_gauss, (*z_sel.shape[:-1], cfg.n_gaussian),
                              z_sel.dtype) * std + mean
        # clamp into [near, far]: the reference leaves these unclamped
        # (nerf_renderer.py:181-190), but an out-of-range draw (wide fitted
        # std / mass near the far plane) makes composite's last delta
        # negative -> exploding negative alpha, and a draw below `near`
        # sorts before the z==0 empty markers, breaking fill_uniform's
        # slot invariant. In-range draws are untouched.
        # lower bound strictly > 0: with near == 0 a clamped draw would be
        # exactly 0.0 and collide with the empty-slot sentinel, silently
        # turning a gaussian sample into a uniform refill
        g = jnp.clip(g, jnp.maximum(rays[..., None, 6], 1e-6),
                     rays[..., None, 7])
        g = jnp.where(hit, g, 0.0)
        z_sel = jnp.concatenate([z_sel[..., : -cfg.n_gaussian], g], axis=-1)

    z_out = fill_uniform(k_fill, z_sel, rays)
    if return_aux:
        return z_out, aux
    return z_out
