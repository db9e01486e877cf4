"""Run-length-dedup quad-latent fetch (PixelNeRF.latent_unique_cells).

Properties under test (index_latent_unique contract):
  1. Exactness: whenever a (ray, view)'s samples touch at most K distinct
     texel cells, the dedup fetch equals the exact per-sample bilinear fetch
     bit-for-bit (same quad rows selected by run id, own in-cell weights).
  2. Overflow: samples past run K-1 reuse the nearest preceding fetched
     cell's row — exact again when the overflow cells coincide with it.
  3. int8-quantized latents dequantize identically to the exact path.
  4. Guard rail: missing quad latent raises.
  5. Render-level: the knob composes with the anchor sampler plumbing end to
     end and stays close to the exact-latent render.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.image_ops.grid_sample import pack_quad
from diner_tpu.models.pixelnerf import (PixelNeRF, index_latent,
                                        index_latent_unique)


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
    u = (ix + 0.5) / W * 2.0 - 1.0
    v = (iy + 0.5) / H * 2.0 - 1.0
    return jnp.stack([u, v], axis=-1)


def _monotone_track(rng, W, H, NR, NS, n_cells):
    """Chord-monotone pixel tracks visiting exactly `n_cells` cells/ray."""
    x0 = rng.randint(0, W - n_cells - 1, (1, 2, NR, 1)).astype(np.float32)
    y0 = rng.randint(0, H - 2, (1, 2, NR, 1)).astype(np.float32)
    # advance x across `n_cells` cells over NS samples, y stays sub-cell
    tx = np.linspace(0.2, n_cells - 1 + 0.8, NS)[None, None, None]
    ix = jnp.asarray(x0 + tx, jnp.float32)
    iy = jnp.asarray(y0 + 0.3 + 0.3 * tx / tx.max(), jnp.float32)
    return _uv_from_pixels(ix, iy, W, H).reshape(1, 2, NR * NS, 2)


def test_unique_exact_when_runs_fit():
    H, W = 8, 16
    enc = _enc(H=H, W=W)
    NR, NS = 5, 12
    uv = _monotone_track(np.random.RandomState(1), W, H, NR, NS, n_cells=4)
    exact = index_latent(enc, uv)
    for K in (4, 6, 9):
        dedup = index_latent_unique(enc, uv, NR, K)
        np.testing.assert_allclose(np.asarray(dedup), np.asarray(exact),
                                   atol=1e-6, err_msg=f"K={K}")


def test_unique_single_cell_ray():
    """All samples in one cell: K=1 is already exact."""
    H, W = 6, 8
    enc = _enc(H=H, W=W, seed=3)
    NR, NS = 4, 8
    rng = np.random.RandomState(2)
    x0 = rng.randint(0, W - 1, (1, 2, NR, 1))
    y0 = rng.randint(0, H - 1, (1, 2, NR, 1))
    frac = np.linspace(0.0, 0.4, NS)[None, None, None]
    ix = jnp.asarray(x0 + 0.3 + frac, jnp.float32)
    iy = jnp.asarray(y0 + 0.2 + frac * 0.5, jnp.float32)
    uv = _uv_from_pixels(ix, iy, W, H).reshape(1, 2, NR * NS, 2)
    exact = index_latent(enc, uv)
    dedup = index_latent_unique(enc, uv, NR, 1)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(exact),
                               atol=1e-6)


def test_unique_overflow_reuses_preceding_cell():
    """G=3 cells but K=2: samples in the 3rd cell reuse run-1's row. With a
    latent CONSTANT over the last two cells, that substitution is exact; the
    first cell's samples stay exact regardless."""
    H, W, C = 4, 8, 3
    lat = np.random.RandomState(4).randn(1, 1, H, W, C).astype(np.float32)
    lat[..., 4:, :] = lat[..., 4:5, :]  # columns 4.. identical
    # make rows identical too so the down/diag corners also match
    lat[:, :, 1:] = lat[:, :, :1]
    latent = jnp.asarray(lat)
    enc = _enc(NV=1, H=H, W=W, C=C, latent=latent)

    NS = 9
    # track crosses cells x=4 -> 5 -> 6 at y=1.3
    tx = np.linspace(4.2, 6.8, NS)[None, None, None]
    ix = jnp.asarray(tx, jnp.float32)
    iy = jnp.full_like(ix, 1.3)
    uv = _uv_from_pixels(ix, iy, W, H).reshape(1, 1, NS, 2)

    exact = index_latent(enc, uv)
    dedup = index_latent_unique(enc, uv, 1, 2)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(exact),
                               atol=1e-6)


def test_unique_int8_matches_exact_quantized_path():
    H, W = 8, 16
    rng = np.random.RandomState(5)
    latent = rng.randn(1, 2, H, W, 4).astype(np.float32)
    scale = np.abs(latent).reshape(-1, 4).max(0) / 127.0
    q = np.clip(np.round(latent / scale), -127, 127).astype(np.int8)
    dummy = jnp.zeros((1, 2, H, W, 1), jnp.float32)
    enc = SceneEncoding(
        latent=jnp.asarray(q), depths=dummy, depth_stds=dummy,
        normals=jnp.zeros((1, 2, H, W, 3), jnp.float32),
        poses=jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4)),
        focal=jnp.ones((1, 2, 2)), c=jnp.ones((1, 2, 2)),
        latent_quad=pack_quad(jnp.asarray(q)),
        latent_scale=jnp.asarray(scale, jnp.float32), feature_padding=0)

    NR, NS = 3, 10
    uv = _monotone_track(np.random.RandomState(6), W, H, NR, NS, n_cells=3)
    exact = index_latent(enc, uv)
    dedup = index_latent_unique(enc, uv, NR, 5)
    np.testing.assert_allclose(np.asarray(dedup), np.asarray(exact),
                               atol=1e-5)


def test_unique_requires_quad():
    enc = _enc()
    enc = enc.replace(latent_quad=None)
    uv = jnp.zeros((1, 2, 8, 2))
    with pytest.raises(ValueError, match="quad_latent"):
        index_latent_unique(enc, uv, 2, 4)


def test_unique_render_end_to_end():
    """Knob composes through field_gather + the anchor sampler plumbing."""
    from diner_tpu.data import SyntheticSphereDataset, collate
    from diner_tpu.geometry import gen_rays
    from diner_tpu.renderer import render_image

    H = W = 16
    ds = SyntheticSphereDataset(n_scenes=1, n_views=2, H=H, W=W)
    batch = collate([ds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    cfg = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3,
                       n_prior_anchors=8, eval_chunk_rays=64)

    outs = {}
    for name, kw in (("exact", {}), ("uc6", dict(latent_unique_cells=6))):
        model = PixelNeRF(encoder_layers=2, image_padding=0, n_blocks=2,
                          d_hidden=32, combine_layer=1, quad_latent=True,
                          **kw)
        variables = model.init(
            jax.random.PRNGKey(0), batch["src_rgbs"], batch["src_depths"],
            batch["src_depth_stds"], batch["src_extrinsics"],
            batch["src_intrinsics"], jnp.zeros((1, 1, 3)),
            jnp.zeros((1, 1, 3)))
        enc = model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                          batch["src_depth_stds"], batch["src_extrinsics"],
                          batch["src_intrinsics"], method="encode")
        rays = gen_rays(batch["target_extrinsics"],
                        batch["target_intrinsics"], W, H, ds.znear, ds.zfar)
        rgb, _ = render_image(
            lambda p, d, aux=None: model.apply(variables, enc, p, d, aux,
                                               method="field"),
            jax.random.PRNGKey(1), rays, enc, cfg, chunk=64)
        outs[name] = np.asarray(rgb)

    mse = float(np.mean((outs["exact"] - outs["uc6"]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 35.0, f"unique-cells render diverged: {psnr:.1f} dB"
