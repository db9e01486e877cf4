"""Strided quad-latent fetch (PixelNeRF.latent_sample_stride).

Properties under test (index_latent_strided contract):
  1. Cell-sharing exactness: when every skipped sample lands in the same
     texel cell as a fetched neighbor, the strided fetch equals the exact
     per-sample bilinear fetch bit-for-bit (same quad row, own weights).
  2. Affine exactness: a latent that is affine in (x, y) makes the bilinear
     field globally affine, so the chord-lerp fallback is also exact —
     isolating the lerp path's correctness.
  3. Fetched samples (stride positions) are always exact.
  4. Guard rails: missing quad latent or non-divisible n_samples raise.
  5. Render-level: a stride-2 render stays close to the exact-latent render
     (and the knob composes with the anchor sampler plumbing end to end).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.image_ops.grid_sample import pack_quad
from diner_tpu.models.pixelnerf import (PixelNeRF, index_latent,
                                        index_latent_strided)


def _enc(SB=1, NV=2, H=6, W=8, C=5, pad=0, latent=None, seed=0):
    rng = np.random.RandomState(seed)
    if latent is None:
        latent = jnp.asarray(rng.randn(SB, NV, H, W, C).astype(np.float32))
    dummy = jnp.zeros((SB, NV, H, W, 1), jnp.float32)
    return SceneEncoding(
        latent=latent, depths=dummy, depth_stds=dummy,
        normals=jnp.zeros((SB, NV, H, W, 3), jnp.float32),
        poses=jnp.broadcast_to(jnp.eye(4), (SB, NV, 4, 4)),
        focal=jnp.ones((SB, NV, 2)), c=jnp.ones((SB, NV, 2)),
        latent_quad=pack_quad(latent), feature_padding=pad)


def _uv_from_pixels(ix, iy, W, H):
    """Pixel coords (centers at 0..size-1) -> normalized uv
    (align_corners=False; inverse of grid_sample's _unnormalize)."""
    u = (ix + 0.5) / W * 2.0 - 1.0
    v = (iy + 0.5) / H * 2.0 - 1.0
    return jnp.stack([u, v], axis=-1)


def test_strided_exact_when_cell_shared():
    H, W = 6, 8
    enc = _enc(H=H, W=W)
    NR, NS = 4, 8
    rng = np.random.RandomState(1)
    # all samples of a (ray, view) inside one texel cell: base at cell-offset
    # 0.3, monotone sub-cell steps up to +0.4
    x0 = rng.randint(0, W - 1, (1, 2, NR, 1))
    y0 = rng.randint(0, H - 1, (1, 2, NR, 1))
    frac = np.linspace(0.0, 0.4, NS)[None, None, None]
    ix = jnp.asarray(x0 + 0.3 + frac, jnp.float32)
    iy = jnp.asarray(y0 + 0.3 + frac * 0.5, jnp.float32)
    uv = _uv_from_pixels(ix, iy, W, H).reshape(1, 2, NR * NS, 2)

    exact = index_latent(enc, uv)
    strided = index_latent_strided(enc, uv, NR, 2)
    np.testing.assert_allclose(np.asarray(strided), np.asarray(exact),
                               atol=1e-6)


def test_strided_exact_on_affine_latent():
    """Affine latent -> globally affine bilinear field -> the chord-lerp
    fallback is exact too; only selects/weights could break it."""
    H, W, C = 7, 9, 3
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    lat = np.stack([1.5 * xx - 0.5 * yy + 2.0,
                    0.25 * xx + yy,
                    -xx + 0.75 * yy - 1.0], axis=-1).astype(np.float32)
    latent = jnp.asarray(np.broadcast_to(lat, (1, 2, H, W, C)))
    enc = _enc(NV=2, H=H, W=W, C=C, latent=latent)

    NR, NS = 3, 8
    rng = np.random.RandomState(2)
    # monotone chords crossing many cells (interior, so border clamping
    # keeps the field affine over every queried cell)
    ix0 = rng.uniform(0.6, 2.0, (1, 2, NR, 1))
    iy0 = rng.uniform(0.6, 2.0, (1, 2, NR, 1))
    t = np.linspace(0.0, 1.0, NS)[None, None, None]
    ix = jnp.asarray(ix0 + t * (W - 2.2 - ix0), jnp.float32)
    iy = jnp.asarray(iy0 + t * (H - 2.2 - iy0), jnp.float32)
    uv = _uv_from_pixels(ix, iy, W, H).reshape(1, 2, NR * NS, 2)

    exact = index_latent(enc, uv)
    strided = index_latent_strided(enc, uv, NR, 2)
    np.testing.assert_allclose(np.asarray(strided), np.asarray(exact),
                               atol=1e-4)


def test_strided_fetched_positions_always_exact():
    H, W = 6, 8
    enc = _enc(H=H, W=W, seed=3)
    NR, NS, L = 5, 8, 2
    rng = np.random.RandomState(4)
    # arbitrary monotone-x walks crossing cells
    ix = np.sort(rng.uniform(0, W - 1, (1, 2, NR, NS)), axis=-1)
    iy = np.sort(rng.uniform(0, H - 1, (1, 2, NR, NS)), axis=-1)
    uv = _uv_from_pixels(jnp.asarray(ix, jnp.float32),
                         jnp.asarray(iy, jnp.float32), W, H
                         ).reshape(1, 2, NR * NS, 2)

    exact = np.asarray(index_latent(enc, uv)).reshape(1, 2, NR, NS, -1)
    strided = np.asarray(index_latent_strided(enc, uv, NR, L)
                         ).reshape(1, 2, NR, NS, -1)
    np.testing.assert_allclose(strided[..., ::L, :], exact[..., ::L, :],
                               atol=1e-6)


def test_strided_guard_rails():
    H, W = 6, 8
    enc = _enc(H=H, W=W)
    uv = jnp.zeros((1, 2, 4 * 8, 2))
    with pytest.raises(ValueError, match="divisible"):
        index_latent_strided(enc, uv, 4, 3)  # 8 % 3 != 0
    enc_noquad = enc.replace(latent_quad=None)
    with pytest.raises(ValueError, match="quad"):
        index_latent_strided(enc_noquad, uv, 4, 2)


def test_strided_render_close_to_exact():
    from diner_tpu.renderer import render_image
    from diner_tpu.geometry import gen_rays
    from tests.test_renderer import _tiny_model_and_batch

    model, images, base = _tiny_model_and_batch()
    model = model.clone(quad_latent=True)
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K),
                           xyz, xyz)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")

    img_rays = gen_rays(base.poses[:, 0], jnp.asarray(K[:, 0]), 8, 8, 1.0, 3.0)
    cfg = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3,
                       n_prior_anchors=8, anchor_field_depth=True)

    def render_with(m):
        return render_image(
            lambda p, d, aux=None: m.apply(variables, enc, p, d, aux,
                                           method="field"),
            jax.random.PRNGKey(2), img_rays, enc, cfg, chunk=64)

    rgb_exact, _ = render_with(model)
    rgb_strided, _ = render_with(model.clone(latent_sample_stride=2))
    mse = float(np.mean((np.asarray(rgb_strided) - np.asarray(rgb_exact)) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    assert psnr > 35.0, f"stride-2 vs exact render PSNR {psnr:.2f}"
