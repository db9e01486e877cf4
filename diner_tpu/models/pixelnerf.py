"""PixelNeRF: pixel-aligned conditioned radiance field with depth-aware fusion.

Behavioral reference: src/models/pixelnerf.py:12-145 in malteprinzler/diner.
`encode` builds an explicit SceneEncoding (features + depth/std/normal maps +
cameras); `field` evaluates (rgb, sigma) at world points by projecting into
every source view, gathering pixel-aligned features, positional-encoding the
cam-space position and the *signed distance to the MVS surface*
(depth_dist = sampled_ref_depth - point_z, DINER's depth-aware feature), and
running the view-conditioned ResnetFC with a mid-network view average.

ImageNet normalization constants match torchvision (pixelnerf.py:32-33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diner_tpu.core.types import SceneEncoding
from diner_tpu.geometry import depth2normal, transform_points, project_points
from diner_tpu.image_ops import grid_sample
from diner_tpu.image_ops.grid_sample import (pack_quad, grid_sample_quad,
                                             quad_blend, quad_cells)
from diner_tpu.nn import SpatialEncoder, ResnetFC, posenc, posenc_dim

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def _scale_uv_for_feature_padding(enc: SceneEncoding, uv):
    """Account for the latent's replication-padded border: shrink uv so that
    the un-padded image still spans the same normalized extent
    (image_encoder.py:113-114)."""
    if enc.feature_padding == 0:
        return uv
    wf = enc.latent.shape[3]
    hf = enc.latent.shape[2]
    size = jnp.asarray([wf, hf], uv.dtype)
    return uv * (size - 2.0 * enc.feature_padding) / size


def index_latent(enc: SceneEncoding, uv):
    """(SB, NV, N, 2) -> (SB, NV, N, C), bilinear/border.

    Uses the quad-packed latent (one gather) when the encoding carries it.
    int8-quantized latents (latent_scale set) are dequantized after the
    bilinear combine — (sum_i w_i q_i) * scale equals the bilinear
    interpolation of the dequantized features exactly."""
    uv = _scale_uv_for_feature_padding(enc, uv)
    if enc.latent_quad is not None:
        out = grid_sample_quad(enc.latent_quad, uv)
        if enc.latent_scale is not None:
            out = out * enc.latent_scale
        return out
    assert enc.latent_scale is None, \
        "latent_quant='int8' requires quad_latent=True"
    return grid_sample(enc.latent, uv, mode="bilinear", padding_mode="border")


def index_latent_anchored(enc: SceneEncoding, uv, epi_aux, n_anchors: int):
    """Epipolar-anchor latent fetch: per (ray, view), gather the latent at
    `n_anchors` points spanning the SAMPLE segment of the epipolar chord and
    linearly interpolate per sample (a 2-hot MXU matmul).

    The samples' chord coordinates come from the same closed-form arithmetic
    as `anchor_ids`; anchors cover [min_s, max_s] of the actual samples of
    each ray, so anchor spacing is sample-span-px / (n_anchors - 1) — with
    depth-guided sampling the span is typically a few px, giving sub-pixel
    spacing (tighter than the reference's own +-0.5 px nearest-prior
    quantization). The interpolation is a piecewise-linear cut through the
    bilinear latent field along the chord. Cuts latent-gather rows by
    n_samples / n_anchors (the dominant render-time HBM cost).

    uv: (SB, NV, B, 2) ray-major with B = NR * NS. Returns (SB, NV, B, C).
    """
    if n_anchors < 2:
        raise ValueError("latent_anchors needs >= 2 anchors per chord "
                         "(1 would divide by zero; use 0 for the exact "
                         "bilinear fetch)")
    SB, NV, B, _ = uv.shape
    NR = epi_aux.uv0.shape[2]
    NS = B // NR
    A = n_anchors
    uvr = uv.reshape(SB, NV, NR, NS, 2)

    # continuous chord coordinate s in [0, 1] (anchor_ids, sans rounding)
    t = jnp.sum((uvr - epi_aux.uv0[..., None, :])
                * epi_aux.duv[..., None, :], axis=-1)  # (SB, NV, NR, NS)
    dd = epi_aux.dd[..., None]
    s = jnp.where(dd > 1e-12, t / jnp.where(dd == 0, 1.0, dd), 0.5)
    s = jnp.clip(s, 0.0, 1.0)

    s_min = jnp.min(s, axis=-1)  # (SB, NV, NR)
    span = jnp.maximum(jnp.max(s, axis=-1) - s_min, 1e-8)
    frac = jnp.arange(A, dtype=s.dtype) / (A - 1)  # (A,)
    s_anchor = s_min[..., None] + frac * span[..., None]  # (SB, NV, NR, A)
    uv_anchor = epi_aux.uv0[..., None, :] \
        + s_anchor[..., None] * epi_aux.duv[..., None, :]
    lat = index_latent(enc, uv_anchor.reshape(SB, NV, NR * A, 2))
    lat = lat.reshape(SB, NV, NR, A, lat.shape[-1])

    # per-sample fractional anchor index -> 2-hot interpolation matrix,
    # contracted on the MXU: (NS, A) @ (A, C)
    x = (s - s_min[..., None]) / span[..., None] * (A - 1)  # (SB, NV, NR, NS)
    i0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, A - 2)
    w = (x - i0.astype(x.dtype))[..., None]  # (SB, NV, NR, NS, 1)
    two_hot = (jax.nn.one_hot(i0, A, dtype=lat.dtype) * (1.0 - w)
               + jax.nn.one_hot(i0 + 1, A, dtype=lat.dtype) * w)
    out = jnp.einsum("svrna,svrac->svrnc", two_hot, lat,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(SB, NV, B, out.shape[-1])


def index_latent_strided(enc: SceneEncoding, uv, n_rays: int, stride: int):
    """Strided quad-latent fetch with cell-sharing exactness.

    Gathers quad rows only at every `stride`-th sample along each ray and
    reconstructs the skipped samples:
      - a skipped sample whose texel cell equals a fetched neighbor's cell
        gets its EXACT bilinear value (the neighbor's quad row already holds
        all 4 corners; only the in-cell weights differ), and
      - only cell-crossing samples fall back to a chord-linear interpolation
        of the two neighboring fetched values.

    Depth-guided samples cluster sub-texel near the surface prior, so the
    fallback fires mostly on spread (low-evidence) rays — the construction
    is exact wherever round-3's `latent_anchors` interpolation lost quality.
    Cuts the dominant render-time gather rows by `stride`.

    uv: (SB, NV, B, 2) ray-major with B = n_rays * NS, samples z-sorted
    (chord-monotone). Requires the quad-packed latent and NS % stride == 0.
    Returns (SB, NV, B, C).
    """
    if enc.latent_quad is None:
        raise ValueError("latent_sample_stride requires quad_latent=True")
    SB, NV, B, _ = uv.shape
    NR = n_rays
    NS = B // NR
    L = stride
    if NS % L:
        raise ValueError(f"n_samples={NS} not divisible by "
                         f"latent_sample_stride={L}")
    P = NS // L

    uvs = _scale_uv_for_feature_padding(enc, uv)
    Hq, Wq, C4 = enc.latent_quad.shape[-3:]
    idx, wx, wy = quad_cells(Hq, Wq, uvs)  # (SB, NV, B)

    # fetch positions: 0, L, ..., (P-1)L plus the LAST sample, so every
    # sample group is bracketed by real anchors (P+1 rows per ray)
    f_pos = np.concatenate([np.arange(P) * L, [NS - 1]])  # (P+1,) static
    idx_s = idx.reshape(SB, NV, NR, NS)
    idx_f = idx_s[..., f_pos]  # (SB, NV, NR, P+1)
    imgs = enc.latent_quad.reshape(SB * NV, Hq * Wq, C4)
    rows_f = jnp.take_along_axis(
        imgs, idx_f.reshape(SB * NV, NR * (P + 1))[..., None], axis=1,
        mode="clip").reshape(SB, NV, NR, P + 1, C4)
    rows_e, rows_n = rows_f[..., :P, :], rows_f[..., 1:, :]
    idx_e, idx_n = idx_f[..., :P], idx_f[..., 1:]

    idx_r = idx_s.reshape(SB, NV, NR, P, L)
    # heavy elementwise runs in the latent's own dtype (bf16 at flagship):
    # the f32 variant materializes ~10 GB of (B, C) f32 temps per 4096-ray
    # chunk and overflows the 16 GB chip; the blend error is below the bf16
    # quantization already applied to the rows
    wdt = rows_f.dtype
    wx_r = wx.reshape(SB, NV, NR, P, L).astype(wdt)
    wy_r = wy.reshape(SB, NV, NR, P, L).astype(wdt)

    # exact value through the matching anchor's row at each sample's own
    # in-cell weights: pick the row FIRST (left if the cell matches it,
    # else right — r=0 always matches left, the final sample its right
    # anchor = itself), then blend ONCE
    same_left = idx_r == idx_e[..., None]
    same_right = idx_r == idx_n[..., None]
    rows_sel = jnp.where(same_left[..., None], rows_e[..., None, :],
                         rows_n[..., None, :])  # (SB, NV, NR, P, L, 4C)
    val_cell = quad_blend(rows_sel, wx_r, wy_r)

    # fallback: chord-linear interpolation between the anchors' own values
    # (collinear uv -> projection parameter t in [0, 1])
    uvs_f = uvs.reshape(SB, NV, NR, NS, 2)
    uv_anchor = uvs_f[..., f_pos, :]  # (SB, NV, NR, P+1, 2)
    uv_l, uv_n = uv_anchor[..., :P, :], uv_anchor[..., 1:, :]
    wx_f, wy_f = wx.reshape(idx_s.shape)[..., f_pos].astype(wdt), \
        wy.reshape(idx_s.shape)[..., f_pos].astype(wdt)
    val_anchor = quad_blend(rows_f, wx_f, wy_f)  # (SB, NV, NR, P+1, C)
    duv = uv_n - uv_l
    dd = jnp.sum(duv * duv, axis=-1)  # (SB, NV, NR, P)
    uvs_r = uvs_f.reshape(SB, NV, NR, P, L, 2)
    t = jnp.sum((uvs_r - uv_l[..., None, :]) * duv[..., None, :], axis=-1)
    t = jnp.clip(jnp.where(dd[..., None] > 1e-12,
                           t / jnp.maximum(dd[..., None], 1e-12), 0.0),
                 0.0, 1.0).astype(wdt)  # (SB, NV, NR, P, L)
    v_l = val_anchor[..., :P, None, :]   # broadcast over L
    v_n = val_anchor[..., 1:, None, :]
    val_lerp = v_l * (1.0 - t[..., None]) + v_n * t[..., None]

    out = jnp.where((same_left | same_right)[..., None], val_cell, val_lerp)
    out = out.reshape(SB, NV, B, out.shape[-1])
    if enc.latent_scale is not None:
        out = out * enc.latent_scale
    return out


def index_latent_unique(enc: SceneEncoding, uv, n_rays: int, n_cells: int):
    """Run-length-dedup quad-latent fetch: gather each ray's DISTINCT texel
    cells once, reconstruct per-sample rows with an exact one-hot MXU
    contraction.

    When consecutive z-sorted samples share a texel cell, the
    per-(ray,sample,view) quad gather (the dominant render-time HBM cost,
    ~26 ms of a ~70 ms flagship chunk) re-fetches the SAME quad row. Samples
    are chord-monotone, so each (ray, view)'s cell sequence is a set of G
    contiguous runs; this fetch gathers K = `n_cells` rows per (ray, view) —
    one per run — and selects each sample's row by its run id with a one-hot
    matmul (exact: 0/1 weights, single nonzero per row, f32 MXU
    accumulation).

    EXACT bilinear semantics (bit-equal to `grid_sample_quad`) for every
    sample whose run id < K. Overflow samples (G > K) reuse the nearest
    PRECEDING fetched cell's row with their own in-cell weights.

    Applicability caveat (scripts/probe_cell_runs.py): rays whose top-k
    shortlist comes up empty get UNIFORM refills spanning the whole chord —
    on the flagship bench scene most rays miss the surface and land in a new
    cell nearly every sample (mean G = 38.6 of 40), so K << n_samples
    substitutes wrong-cell rows on exactly those rays. Use only on workloads
    whose sample tracks actually cluster (tight trained priors, mostly-
    foreground frames), and validate PSNR-vs-exact first.

    uv: (SB, NV, B, 2) ray-major with B = n_rays * NS, samples z-sorted
    (chord-monotone). Requires the quad-packed latent. Returns (SB, NV, B, C).
    """
    if enc.latent_quad is None:
        raise ValueError("latent_unique_cells requires quad_latent=True")
    SB, NV, B, _ = uv.shape
    NR = n_rays
    NS = B // NR
    K = n_cells

    uvs = _scale_uv_for_feature_padding(enc, uv)
    Hq, Wq, C4 = enc.latent_quad.shape[-3:]
    idx, wx, wy = quad_cells(Hq, Wq, uvs)  # (SB, NV, B)
    idx_s = idx.reshape(SB, NV, NR, NS)

    # run id per sample: 0-based cumulative count of cell changes
    neq = idx_s[..., 1:] != idx_s[..., :-1]
    g = jnp.cumsum(neq.astype(jnp.int32), axis=-1)
    g = jnp.concatenate([jnp.zeros_like(g[..., :1]), g], axis=-1)
    gk = jnp.minimum(g, K - 1)  # overflow -> last fetched run

    # run -> cell table. Within a run every cell id is equal, so max = the
    # value; empty runs (G < K) resolve to 0 (row 0 fetched, never selected);
    # the overflow run K-1 mixes cells and max picks one of them (its row is
    # only used by overflow samples).
    onehot = jax.nn.one_hot(gk, K, dtype=jnp.int32)        # (SB,NV,NR,NS,K)
    cells = jnp.max(idx_s[..., None] * onehot, axis=-2)    # (SB,NV,NR,K)

    imgs = enc.latent_quad.reshape(SB * NV, Hq * Wq, C4)
    rows_k = jnp.take_along_axis(
        imgs, cells.reshape(SB * NV, NR * K)[..., None], axis=1,
        mode="clip").reshape(SB, NV, NR, K, C4)

    # exact row reconstruction on the MXU: one-hot (NS, K) @ rows (K, 4C).
    # int8 rows convert exactly to bf16 (integers <= 127); a one-hot select
    # with f32 accumulation reproduces row values bit-exactly.
    cdt = jnp.bfloat16 if rows_k.dtype == jnp.int8 else rows_k.dtype
    rows = jnp.einsum("svrnk,svrkc->svrnc", onehot.astype(cdt),
                      rows_k.astype(cdt))
    rows = rows.reshape(SB, NV, B, C4)

    out = quad_blend(rows, wx, wy)
    if enc.latent_scale is not None:
        out = out * enc.latent_scale
    return out


def index_depth(enc: SceneEncoding, uv):
    return grid_sample(enc.depths, uv, mode="nearest", padding_mode="border")


def index_depth_std(enc: SceneEncoding, uv):
    # sigma grows x2 every 12 px outside the image, zero beyond 100 px
    # (image_encoder.py:186-195) -> rays leaving a source frustum carry weak
    # surface evidence instead of hard borders.
    return grid_sample(enc.depth_stds, uv, mode="nearest",
                       padding_mode="exponential",
                       pad_double_width=12.0, pad_size=100)


def index_normal(enc: SceneEncoding, uv):
    return grid_sample(enc.normals, uv, mode="nearest", padding_mode="zeros")


def _anchor_ref_depth(epi_aux, uv):
    """Per-sample MVS depth from the sampler's epipolar anchor table.

    epi_aux: EpiAnchors with depth (SB, NV, NR, A); uv: (SB, NV, B, 2) with
    B = NR * NS ordered ray-major. Maps each sample's projection to its
    nearest anchor on the chord (pure arithmetic — collinear points) and
    selects the anchor depth with an exact-f32 MXU one-hot remap on TPU
    (take_along_axis elsewhere). Returns (SB, NV, B) f32.
    """
    from diner_tpu.sampler import anchor_ids

    SB, NV, NR, A = epi_aux.depth.shape
    B = uv.shape[2]
    NS = B // NR
    uvr = uv.reshape(SB, NV, NR, NS, 2)
    a = anchor_ids(uvr, epi_aux.uv0, epi_aux.duv, epi_aux.dd, A)

    from diner_tpu.utils.jitinit import use_tpu_kernels

    if use_tpu_kernels():
        from diner_tpu.sampler.pallas_remap import remap_anchors_pallas

        G = SB * NV * NR
        out = remap_anchors_pallas(
            a.reshape(G, NS),
            epi_aux.depth.reshape(G, 1, A).astype(jnp.float32),
            exact=True)  # (G, 1, NS)
        return out.reshape(SB, NV, B)
    ref = jnp.take_along_axis(epi_aux.depth, a.reshape(SB, NV, NR, NS),
                              axis=-1)
    return ref.reshape(SB, NV, B)


class PixelNeRF(nn.Module):
    """Flagship model. Use `.apply(vars, ..., method="encode"/"field")`."""

    # positional-encoding config (poscode & depthcode share it; train_dtu.yaml:40-43)
    num_freqs: int = 6
    freq_factor: float = 6.28
    # encoder config
    backbone: str = "resnet34"
    encoder_layers: int = 4
    encoder_norm: str = "group"
    image_padding: int = 64
    padding_pe: int = 4
    # mlp config (train_dtu.yaml:47-50)
    n_blocks: int = 5
    d_hidden: int = 512
    combine_layer: int = 3
    # "bfloat16" runs the encoder convs + field MLP in bf16 (params f32);
    # geometry, sampling, and compositing stay f32.
    compute_dtype: str = "float32"
    # quad-pack the latent at encode time: 4x fewer render-time gathers for
    # 4x latent memory (enable for eval/serving; off keeps training memory low)
    quad_latent: bool = False
    # "int8": symmetric per-channel quantization of the pixel-aligned
    # feature table at encode time (q = round(f/scale), scale = max|f|/127).
    # Halves the HBM bytes of the dominant render-time gather; dequant folds
    # into the bilinear combine, so interpolation is exact on the quantized
    # values (error = the <=0.8% per-channel rounding). Requires
    # quad_latent=True. "none" keeps full precision (reference semantics).
    latent_quant: str = "none"
    # rematerialize the field MLP on backward: trades FLOPs for activation
    # memory so large ray batches train on one chip (SURVEY.md HBM note)
    remat_field: bool = False
    # >0: epipolar-anchor latent fetch — gather the latent at N anchors over
    # each ray's sample segment and 2-hot-interpolate per sample on the MXU
    # (index_latent_anchored). Cuts the dominant render-time gather by
    # n_samples/N. Render-time approximation knob (needs the sampler's
    # EpiAnchors, i.e. RenderConfig.n_prior_anchors > 0 and
    # anchor_field_depth); 0 = exact per-sample bilinear (reference
    # semantics). Validate PSNR-vs-exact before eval-parity runs.
    latent_anchors: int = 0
    # >1: strided quad-latent fetch (index_latent_strided) — gather quad rows
    # at every stride-th sample; skipped samples are EXACT whenever they share
    # a texel cell with a fetched neighbor (the quad row holds all 4 corners)
    # and chord-lerp otherwise. Cuts the dominant render-time gather rows by
    # `stride` with far tighter error than latent_anchors (which lerps every
    # sample). Needs quad_latent and the sampler's EpiAnchors ray-major
    # ordering (n_prior_anchors > 0 with anchor_field_depth). 0/1 = exact.
    latent_sample_stride: int = 0
    # >0: run-length-dedup quad-latent fetch (index_latent_unique) — gather
    # only each ray's first K distinct texel cells and reconstruct per-sample
    # rows with an exact one-hot MXU contraction. EXACT bilinear semantics
    # for every sample whose run id < K; overflow samples reuse the nearest
    # preceding fetched cell. Cuts the dominant render-time gather rows
    # n_samples/K-fold — but only helps QUALITY-FREE on workloads whose
    # sample tracks cluster into <= K cells; rays refilled uniformly (empty
    # shortlists) span the whole chord and overflow badly (see the
    # index_latent_unique caveat + scripts/probe_cell_runs.py). Needs
    # quad_latent and the sampler's EpiAnchors ray-major ordering
    # (n_prior_anchors > 0 with anchor_field_depth). 0 = exact fetch.
    latent_unique_cells: int = 0
    # initial bias of the sigma output channel: keeps the relu density head
    # alive at init (a dead head freezes training — zero compositing weights
    # give zero gradients). 0.0 reproduces the reference's zero-bias init.
    sigma_bias_init: float = 0.5
    # "softplus" (default) has no dead region: background-dominated early
    # gradients push sigma negative globally, and with relu that is an
    # absorbing state (observed: irreversible collapse at every lr when
    # training the full encoder from scratch). "relu" matches the reference
    # exactly — use it for ported checkpoints.
    sigma_activation: str = "softplus"

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None

    def setup(self):
        self.encoder = SpatialEncoder(
            backbone=self.backbone, num_layers=self.encoder_layers,
            norm=self.encoder_norm, image_padding=self.image_padding,
            padding_pe=self.padding_pe, dtype=self._dtype)
        d_in = (posenc_dim(3, self.num_freqs) + posenc_dim(1, self.num_freqs) + 3)
        # static_argnums=(2,): combine_axis must stay a Python int under remat
        # (flax offsets the index by one for the module itself)
        mlp_cls = (nn.remat(ResnetFC, static_argnums=(2,))
                   if self.remat_field else ResnetFC)
        self.mlp = mlp_cls(d_in=d_in, d_out=4, n_blocks=self.n_blocks,
                           d_latent=self.encoder.latent_size,
                           d_hidden=self.d_hidden,
                           combine_layer=self.combine_layer,
                           dtype=self._dtype,
                           out_bias_init=(0.0, 0.0, 0.0, self.sigma_bias_init),
                           zero_init_out_channels=(3,))

    def __call__(self, images, depths, depth_stds, extrinsics, intrinsics,
                 xyz, viewdirs, train: bool = False):
        """Init/shape-check path: encode then evaluate the field once."""
        enc = self.encode(images, depths, depth_stds, extrinsics, intrinsics,
                          train=train)
        return self.field(enc, xyz, viewdirs)

    def encode(self, images, depths, depth_stds, extrinsics, intrinsics,
               train: bool = False) -> SceneEncoding:
        """images: (SB, NV, H, W, 3) in [0, 1]; depths/stds: (SB, NV, H, W, 1);
        extrinsics: (SB, NV, 4, 4); intrinsics: (SB, NV, 3, 3)."""
        SB, NV, H, W, _ = images.shape
        mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
        std = jnp.asarray(IMAGENET_STD, images.dtype)
        x = (images - mean) / std

        normals = depth2normal(depths.reshape(SB * NV, H, W, 1),
                               intrinsics.reshape(SB * NV, 3, 3))
        normals = normals.reshape(SB, NV, H, W, 3)

        latent = self.encoder(x.reshape(SB * NV, H, W, 3), train=train)
        latent = latent.reshape(SB, NV, *latent.shape[1:])
        latent_scale = None
        if self.latent_quant == "int8":
            assert self.quad_latent, "latent_quant='int8' requires quad_latent"
            scale = jnp.max(jnp.abs(latent), axis=(0, 1, 2, 3)) / 127.0
            scale = jnp.maximum(scale, 1e-12)
            latent = jnp.clip(jnp.round(latent / scale), -127, 127
                              ).astype(jnp.int8)
            latent_scale = scale.astype(jnp.float32)
        elif self._dtype is not None:
            # store the pixel-aligned features in bf16: halves the bytes the
            # render-time bilinear gathers read from HBM (the field hot path)
            latent = latent.astype(self._dtype)

        focal = intrinsics[..., jnp.array([0, 1]), jnp.array([0, 1])]
        c = intrinsics[..., :2, 2]
        return SceneEncoding(latent=latent, depths=depths,
                             depth_stds=depth_stds, normals=normals,
                             poses=extrinsics, focal=focal, c=c,
                             latent_quad=pack_quad(latent) if self.quad_latent
                             else None,
                             latent_scale=latent_scale,
                             feature_padding=self.encoder.feature_padding)

    def field_gather(self, enc: SceneEncoding, xyz, epi_aux=None):
        """HBM-bound half of the field: project xyz into every view and fetch
        the pixel-aligned latent rows + per-sample MVS ref depth.

        Split out so the pipelined renderer can overlap this stage (gather
        unit / HBM) with the previous chunk's MLP (MXU) inside one XLA
        program — the two have no data dependence across chunks and the TPU
        scheduler runs them concurrently (measured ~94% overlap).
        Returns dict(latent (SB, NV, B, C), ref_depth (SB, NV, B)).
        """
        SB, B, _ = xyz.shape
        NV = enc.poses.shape[1]
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SB, NV, B, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)  # (SB, NV, B, 3)
        uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)
        if self.latent_anchors and epi_aux is not None:
            latent = index_latent_anchored(enc, uv, epi_aux,
                                           self.latent_anchors)
        elif self.latent_unique_cells and epi_aux is not None:
            latent = index_latent_unique(enc, uv, epi_aux.uv0.shape[2],
                                         self.latent_unique_cells)
        elif self.latent_sample_stride > 1 and epi_aux is not None:
            latent = index_latent_strided(enc, uv, epi_aux.uv0.shape[2],
                                          self.latent_sample_stride)
        else:
            latent = index_latent(enc, uv)  # (SB, NV, B, C)
        if epi_aux is not None:
            ref_depth = _anchor_ref_depth(epi_aux, uv)  # (SB, NV, B)
        else:
            ref_depth = index_depth(enc, uv)[..., 0]  # (SB, NV, B)
        return {"latent": latent, "ref_depth": ref_depth}

    def field_mlp(self, enc: SceneEncoding, gathered, xyz, viewdirs):
        """MXU-bound half: positional features + conditioned MLP + heads.
        `gathered` is `field_gather`'s output for the same xyz. The camera
        transform is recomputed here (a 3x4 einsum — trivial next to the
        MLP) so the pipeline carry holds only the gathered rows."""
        SB, B, _ = xyz.shape
        NV = enc.poses.shape[1]
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SB, NV, B, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)  # (SB, NV, B, 3)

        z_feature = posenc(xyz_cam, self.num_freqs, self.freq_factor)
        dirs_nv = jnp.broadcast_to(viewdirs[:, None], (SB, NV, B, 3))
        dirs_cam = jnp.einsum("svij,svbj->svbi", enc.poses[..., :3, :3], dirs_nv)

        depth_dist = gathered["ref_depth"] - xyz_cam[..., 2]
        depth_feature = posenc(depth_dist[..., None], self.num_freqs,
                               self.freq_factor)

        mlp_in = jnp.concatenate(
            [gathered["latent"], z_feature, dirs_cam, depth_feature], axis=-1)
        out = self.mlp(mlp_in, 1)  # combine over the view axis -> (SB, B, 4)

        rgb = nn.sigmoid(out[..., :3])
        if self.sigma_activation == "softplus":
            sigma = nn.softplus(out[..., 3:4])
        else:
            sigma = nn.relu(out[..., 3:4])
        return jnp.concatenate([rgb, sigma], axis=-1)

    def field(self, enc: SceneEncoding, xyz, viewdirs, epi_aux=None):
        """xyz, viewdirs: (SB, B, 3) world space -> (SB, B, 4) [rgb, sigma].

        epi_aux: optional EpiAnchors from the depth-guided sampler
        (RenderConfig.anchor_field_depth). When given, the per-sample MVS
        depth (the depth_dist feature) is read from the sampler's epipolar
        anchor table by chord arithmetic + an MXU one-hot remap instead of a
        per-sample nearest-pixel image gather; xyz must then be ordered
        ray-major/sample-minor, matching the anchors' ray axis.

        Composition of `field_gather` + `field_mlp` (the pipelined renderer
        calls the halves separately to overlap HBM with MXU across chunks).
        """
        gathered = self.field_gather(enc, xyz, epi_aux)
        return self.field_mlp(enc, gathered, xyz, viewdirs)
