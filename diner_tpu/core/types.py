"""Core pytree types.

The reference caches scene state mutably on nn.Modules
(image_encoder.py:233-237, pixelnerf.py:47-51); here the scene encoding is an
explicit immutable pytree returned by `encode()` and threaded to every render
call — required for jit/pjit and the natural JAX design (SURVEY.md §7.3).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SceneEncoding:
    """Everything render-time code needs about the source views.

    All maps NHWC. SB = scene batch, NV = source views.
    """

    latent: jnp.ndarray       # (SB, NV, Hf, Wf, C) pixel-aligned features
    depths: jnp.ndarray       # (SB, NV, H, W, 1) metric depth, 0 = invalid
    depth_stds: jnp.ndarray   # (SB, NV, H, W, 1) per-pixel depth sigma
    normals: jnp.ndarray      # (SB, NV, H, W, 3) cam-space normals
    poses: jnp.ndarray        # (SB, NV, 4, 4) world->cam extrinsics
    focal: jnp.ndarray        # (SB, NV, 2) [fx, fy]
    c: jnp.ndarray            # (SB, NV, 2) [cx, cy]
    # optional quad-packed latent (pack_quad): one-gather bilinear feature
    # fetch on the render hot path; None -> 4-corner gathers on `latent`
    latent_quad: jnp.ndarray = None
    # per-channel dequantization scale when the latent (and latent_quad) are
    # int8-quantized (PixelNeRF.latent_quant="int8"): feature = q * scale.
    # Halves the bytes the dominant render-time gather moves through HBM;
    # None -> latent stored at full compute precision.
    latent_scale: jnp.ndarray = None
    feature_padding: int = struct.field(pytree_node=False, default=0)

    @property
    def image_shape(self):
        """(W, H) of the source images (static)."""
        return (self.depths.shape[3], self.depths.shape[2])


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static renderer hyperparameters.

    Behavioral reference: src/models/nerf_renderer.py:23-37 defaults +
    configs/train_dtu.yaml:55-58 overrides.
    """

    n_samples: int = 40
    n_depth_candidates: int = 1000
    n_gaussian: int = 15
    depth_diff_max: float = 0.05
    white_bkgd: bool = False
    # rays per jitted render_image tile. The reference chunks the field eval
    # by POINTS (`eval_batch_size=100000`, nerf_renderer.py:28,325); on TPU we
    # tile by RAYS so every tensor in the tile keeps a static shape —
    # eval_chunk_rays ~= eval_batch_size / n_samples. Bigger tiles amortize
    # per-kernel overhead at the cost of peak HBM.
    eval_chunk_rays: int = 8192
    # TPU-native approximate top-k (jax.lax.approx_max_k) for candidate
    # shortlisting: ~recall 0.95+ of the exact set; near-misses are adjacent
    # candidates with near-equal erf mass, so metric parity holds while the
    # selection runs much faster than a full sort. False = exact lax.top_k.
    approx_topk: bool = True
    # gather the depth/std/normal priors only every `prior_stride`-th candidate
    # and share them across the stride group (z stays exact per candidate).
    # Adjacent candidates project ~0.1-0.3 px apart on DTU geometry, i.e. they
    # mostly hit the SAME nearest pixel anyway; stride 2-4 cuts the dominant
    # gather cost proportionally with sub-pixel-level approximation. 1 = exact
    # reference semantics.
    prior_stride: int = 1
    # epipolar-anchor prior fetch: per (ray, view), all depth candidates
    # project onto one straight epipolar segment in the source image; gather
    # the priors at `n_prior_anchors` points spaced uniformly ALONG that
    # segment (instead of at each of the `n_depth_candidates` projections) and
    # give every candidate its nearest anchor's priors. Pixel-position error
    # is <= chord_px / (2 * n_prior_anchors), i.e. within the reference's own
    # +-0.5 px nearest-pixel quantization whenever the segment is shorter than
    # n_prior_anchors pixels — while cutting the dominant gather count
    # n_depth_candidates / n_prior_anchors-fold. 0 = exact per-candidate
    # gathers (reference semantics). Mutually exclusive with prior_stride > 1.
    n_prior_anchors: int = 0
    # reuse the sampler's epipolar anchors for the field's per-sample MVS
    # depth lookup (the depth_dist feature, pixelnerf.py: ref depth at each
    # sample's projection): the final z samples lie on the same epipolar
    # chord as the candidates, so their nearest-pixel depth can be read from
    # the already-gathered anchor table by pure arithmetic + an MXU one-hot
    # remap — no per-sample image gather. Same error class as
    # n_prior_anchors (anchor spacing <= chord_px / (2 * A) vs the
    # reference's own +-0.5 px nearest-pixel quantization). Only active when
    # n_prior_anchors > 0; False restores exact per-sample gathers.
    anchor_field_depth: bool = True
    # Paired-anchor prior fetch: consecutive anchor PAIRS share ONE gather
    # row from a 2x2-packed prior table (the v5e gather engine is
    # row-rate-bound, so this halves the dominant anchor-gather cost).
    # Each anchor then selects its own nearest pixel from the quad around
    # the pair midpoint — BIT-IDENTICAL to the per-anchor gather whenever
    # both anchors' nearest pixels fall inside that quad, which holds when
    # the anchor spacing is <= 1 px per image axis (chord shorter than
    # n_prior_anchors pixels along that axis). Longer chords clamp the
    # selection into the quad (positional error <= spacing/2 - 0.5 px,
    # the same error class as the anchor discretization itself). Only
    # active when n_prior_anchors > 0 and it is even.
    paired_prior_gather: bool = False
