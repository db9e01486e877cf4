"""Compositing golden values and full-model render smoke tests."""

import numpy as np
import jax
import jax.numpy as jnp

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.renderer import composite, render_rays, render_image
from diner_tpu.models import PixelNeRF

from test_sampler import _make_enc, _center_rays  # reuse synthetic scene


def test_composite_constant_sigma_closed_form():
    """Uniform medium: T(far) = exp(-sigma * (far - near)); rgb = c * (1 - T)."""
    sigma0, c0, near, far, K = 1.7, 0.6, 1.0, 3.0, 256

    def field(xyz, dirs):
        rgb = jnp.full((*xyz.shape[:-1], 3), c0)
        sig = jnp.full((*xyz.shape[:-1], 1), sigma0)
        return jnp.concatenate([rgb, sig], axis=-1)

    rays = _center_rays(near=near, far=far)
    z = jnp.linspace(near, far, K)[None, None]  # includes endpoint; deltas ~ uniform
    weights, rgb, depth = composite(field, rays, z, white_bkgd=False)
    # opacity after the full interval (first sample's alpha uses delta to next)
    total_w = float(weights.sum())
    expect = 1 - np.exp(-sigma0 * (far - near))
    np.testing.assert_allclose(total_w, expect, rtol=2e-2)
    np.testing.assert_allclose(float(rgb[0, 0, 0]) / total_w, c0, rtol=1e-5)
    # expected depth of an exponential medium, truncated: analytic integral
    zs = np.asarray(z)[0, 0]
    w = np.asarray(weights)[0, 0]
    np.testing.assert_allclose(float(depth[0, 0]), (w * zs).sum(), rtol=1e-6)


def test_composite_opaque_surface():
    """A huge-sigma shell at z=2 -> depth == 2, rgb == surface color, w sums 1."""
    near, far = 1.0, 3.0

    def field(xyz, dirs):
        z = xyz[..., 2]
        inside = (jnp.abs(z - 2.0) < 0.05).astype(xyz.dtype)
        sig = (inside * 1e4)[..., None]
        rgb = jnp.stack([jnp.full_like(z, 0.2), jnp.full_like(z, 0.5),
                         jnp.full_like(z, 0.9)], axis=-1)
        return jnp.concatenate([rgb, sig], axis=-1)

    rays = _center_rays(near=near, far=far)
    z = jnp.linspace(near, far, 200)[None, None]
    weights, rgb, depth = composite(field, rays, z, white_bkgd=False)
    np.testing.assert_allclose(float(weights.sum()), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rgb)[0, 0], [0.2, 0.5, 0.9], atol=1e-3)
    # an opaque medium terminates the ray at the shell's *near* boundary (1.95)
    np.testing.assert_allclose(float(depth[0, 0]), 1.95, atol=0.02)


def test_composite_white_background():
    def field(xyz, dirs):
        return jnp.zeros((*xyz.shape[:-1], 4))  # empty space

    rays = _center_rays()
    z = jnp.linspace(1.0, 3.0, 16)[None, None]
    _, rgb, _ = composite(field, rays, z, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(rgb)[0, 0], 1.0, atol=1e-6)


def _tiny_model_and_batch(SB=1, NV=2, H=16, W=20):
    model = PixelNeRF(encoder_layers=2, encoder_norm="group", image_padding=4,
                      padding_pe=2, n_blocks=3, d_hidden=32, combine_layer=2)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(SB, NV, H, W, 3).astype(np.float32))
    base = _make_enc(SB=SB, NV=NV, H=H, W=W, depth=2.0, std=0.1)
    return model, images, base


def test_pixelnerf_encode_and_field_shapes():
    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.asarray(np.random.RandomState(1).randn(1, 7, 3).astype(np.float32))
    dirs = jnp.asarray(np.random.RandomState(2).randn(1, 7, 3).astype(np.float32))

    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K), xyz, dirs)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")
    assert enc.latent.shape[:2] == (1, 2)
    assert enc.latent.shape[-1] == 128  # 2 resnet stages: 64 + 64
    assert enc.feature_padding == 2

    out = model.apply(variables, enc, xyz, dirs, method="field")
    assert out.shape == (1, 7, 4)
    o = np.asarray(out)
    assert (o[..., :3] >= 0).all() and (o[..., :3] <= 1).all()  # sigmoid rgb
    assert (o[..., 3] >= 0).all()  # relu sigma


def test_render_rays_and_image():
    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K), xyz, xyz)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")

    def field_fn(pts, dirs):
        return model.apply(variables, enc, pts, dirs, method="field")

    cfg = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3)
    rays = _center_rays(1, 5)
    out = render_rays(field_fn, jax.random.PRNGKey(1), rays, enc, cfg)
    assert out["rgb"].shape == (1, 5, 3)
    assert out["depth"].shape == (1, 5)

    # tiny image render with chunking (chunk smaller than H*W, non-divisible)
    from diner_tpu.geometry import gen_rays
    img_rays = gen_rays(base.poses[:, 0], jnp.asarray(K[:, 0]), 6, 4, 1.0, 3.0)
    rgb, depth = render_image(field_fn, jax.random.PRNGKey(2), img_rays, enc,
                              cfg, chunk=7)
    assert rgb.shape == (1, 4, 6, 3)
    assert depth.shape == (1, 4, 6)
    assert not np.isnan(np.asarray(rgb)).any()


def test_render_image_sharded_matches_unsharded_shapes():
    """8-device ray sharding: runs, no NaNs, matches unsharded output stats."""
    import jax
    from diner_tpu.parallel import make_mesh, replicate
    from diner_tpu.renderer.sharded import render_image_sharded
    from diner_tpu.geometry import gen_rays

    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K), xyz, xyz)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")

    mesh = make_mesh(axis_names=("data",))
    variables = replicate(variables, mesh)
    enc = replicate(enc, mesh)

    def field_fn(enc_in, pts, dirs, epi_aux=None):
        return model.apply(variables, enc_in, pts, dirs, epi_aux,
                           method="field")

    cfg = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3)
    rays = gen_rays(base.poses[:, 0], jnp.asarray(K[:, 0]), 12, 10, 1.0, 3.0)
    rgb, depth = render_image_sharded(field_fn, jax.random.PRNGKey(1), rays,
                                      enc, cfg, mesh, chunk=8)
    assert rgb.shape == (1, 10, 12, 3)
    assert depth.shape == (1, 10, 12)
    assert not np.isnan(np.asarray(rgb)).any()
    assert float(jnp.abs(rgb).max()) > 0


def test_field_quad_latent_equivalence():
    """field() with quad-packed latent == field() with plain latent."""
    from diner_tpu.image_ops.grid_sample import pack_quad

    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.asarray(np.random.RandomState(5).randn(1, 11, 3).astype(np.float32) * 0.3)
    dirs = jnp.asarray(np.random.RandomState(6).randn(1, 11, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K), xyz, dirs)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")
    out_plain = model.apply(variables, enc, xyz, dirs, method="field")
    enc_quad = enc.replace(latent_quad=pack_quad(enc.latent))
    out_quad = model.apply(variables, enc_quad, xyz, dirs, method="field")
    np.testing.assert_allclose(np.asarray(out_quad), np.asarray(out_plain),
                               rtol=1e-5, atol=1e-6)


def test_pallas_composite_matches_xla():
    """Fused Pallas compositing == the XLA composite (interpret mode on CPU)."""
    from diner_tpu.renderer.pallas_composite import composite_pallas

    rng = np.random.RandomState(0)
    SB, B, K = 2, 37, 16  # non-multiple of block to exercise padding
    z = np.sort(rng.rand(SB, B, K).astype(np.float32) * 2 + 1, axis=-1)
    rays = np.zeros((SB, B, 8), np.float32)
    rays[..., 7] = 3.5
    field_out = rng.rand(SB, B, K, 4).astype(np.float32)
    field_out[..., 3] *= 5

    def field(pts, dirs):  # replay the same outputs through composite()
        return jnp.asarray(field_out.reshape(SB, B * K, 4))

    for wb in (False, True):
        w_ref, rgb_ref, depth_ref = composite(field, jnp.asarray(rays),
                                              jnp.asarray(z), white_bkgd=wb)
        rgb, depth, acc = composite_pallas(jnp.asarray(rays), jnp.asarray(z),
                                           jnp.asarray(field_out),
                                           white_bkgd=wb, block=16,
                                           interpret=True)
        np.testing.assert_allclose(np.asarray(rgb), np.asarray(rgb_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(depth), np.asarray(depth_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(acc),
                                   np.asarray(w_ref.sum(-1)),
                                   rtol=1e-5, atol=1e-6)


def test_render_rays_anchor_field_depth():
    """Anchors on + aux-aware field_fn: the full render agrees closely with
    the exact path (anchor spacing far below a pixel at this scale)."""
    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K), xyz, xyz)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")

    def field_fn(pts, dirs, aux=None):
        return model.apply(variables, enc, pts, dirs, aux, method="field")

    rays = _center_rays(1, 5)
    cfg_exact = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3)
    cfg_anchor = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3,
                              n_prior_anchors=256, anchor_field_depth=True)
    out_e = render_rays(field_fn, jax.random.PRNGKey(1), rays, enc, cfg_exact)
    out_a = render_rays(field_fn, jax.random.PRNGKey(1), rays, enc, cfg_anchor)
    assert not np.isnan(np.asarray(out_a["rgb"])).any()
    np.testing.assert_allclose(np.asarray(out_e["rgb"]),
                               np.asarray(out_a["rgb"]), atol=0.05)

    # a 2-arg field_fn must keep working (falls back to exact index_depth)
    out_b = render_rays(lambda p, d: model.apply(variables, enc, p, d,
                                                 method="field"),
                        jax.random.PRNGKey(1), rays, enc, cfg_anchor)
    assert out_b["rgb"].shape == (1, 5, 3)


def test_int8_latent_quantization():
    """latent_quant='int8': int8 tables + per-channel dequant after the
    bilinear combine; field output stays within quantization error of the
    full-precision path."""
    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 3)) * 0.2
    dirs = jnp.ones((1, 64, 3)) / np.sqrt(3.0)

    outs = {}
    for quant in ("none", "int8"):
        m = model.clone(quad_latent=True, latent_quant=quant)
        variables = m.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K),
                           xyz, dirs)
        enc = m.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")
        if quant == "int8":
            assert enc.latent.dtype == jnp.int8
            assert enc.latent_quad.dtype == jnp.int8
            assert enc.latent_scale is not None
        outs[quant] = np.asarray(m.apply(variables, enc, xyz, dirs,
                                         method="field"))
    d = np.abs(outs["none"] - outs["int8"])
    assert d.max() < 0.1, d.max()


def test_render_image_sharded_with_anchors():
    """Epipolar-anchor sampling + anchor field depth through the 8-device
    ray-sharded renderer (shard_map + aux plumbing)."""
    import jax
    from diner_tpu.parallel import make_mesh, replicate
    from diner_tpu.renderer.sharded import render_image_sharded
    from diner_tpu.geometry import gen_rays

    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K), xyz, xyz)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")

    mesh = make_mesh(axis_names=("data",))
    variables = replicate(variables, mesh)
    enc = replicate(enc, mesh)

    def field_fn(enc_in, pts, dirs, epi_aux=None):
        return model.apply(variables, enc_in, pts, dirs, epi_aux,
                           method="field")

    cfg = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3,
                       n_prior_anchors=16)
    rays = gen_rays(base.poses[:, 0], jnp.asarray(K[:, 0]), 12, 10, 1.0, 3.0)
    rgb, depth = render_image_sharded(field_fn, jax.random.PRNGKey(1), rays,
                                      enc, cfg, mesh, chunk=8)
    assert rgb.shape == (1, 10, 12, 3)
    assert not np.isnan(np.asarray(rgb)).any()
    assert float(jnp.abs(rgb).max()) > 0


def test_render_image_pipelined_matches_sequential():
    """The software-pipelined split-field renderer is a pure reordering:
    rgb/depth equal to render_flat_chunked (to XLA fusion noise) for the same rng, both with
    and without epipolar anchors, including the non-divisible-chunk tail."""
    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K),
                           xyz, xyz)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")

    def field_fn(pts, dirs, aux=None):
        return model.apply(variables, enc, pts, dirs, aux, method="field")

    def gather_fn(pts, aux):
        return model.apply(variables, enc, pts, aux, method="field_gather")

    def mlp_fn(gathered, pts, dirs):
        return model.apply(variables, enc, gathered, pts, dirs,
                           method="field_mlp")

    from diner_tpu.geometry import gen_rays

    img_rays = gen_rays(base.poses[:, 0], jnp.asarray(K[:, 0]), 6, 4, 1.0, 3.0)
    for cfg in (RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3),
                RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3,
                             n_prior_anchors=8, anchor_field_depth=True)):
        for chunk in (7, 24):  # tail + single-chunk paths
            rgb_s, depth_s = render_image(field_fn, jax.random.PRNGKey(2),
                                          img_rays, enc, cfg, chunk=chunk)
            rgb_p, depth_p = render_image(field_fn, jax.random.PRNGKey(2),
                                          img_rays, enc, cfg, chunk=chunk,
                                          split=(gather_fn, mlp_fn))
            np.testing.assert_allclose(np.asarray(rgb_p), np.asarray(rgb_s),
                                       atol=1e-5)
            np.testing.assert_allclose(np.asarray(depth_p),
                                       np.asarray(depth_s), atol=1e-5)


def test_latent_anchors_approximation():
    """Epipolar-anchor latent fetch (PixelNeRF.latent_anchors): with anchors
    at least as dense as the samples the piecewise-linear chord cut is
    near-exact; with fewer anchors the render stays close to the exact-latent
    render (the approximation class documented in index_latent_anchored)."""
    model, images, base = _tiny_model_and_batch()
    K = np.zeros((1, 2, 3, 3), np.float32)
    K[..., 0, 0] = K[..., 1, 1] = 20.0
    K[..., 0, 2], K[..., 1, 2], K[..., 2, 2] = 10.0, 8.0, 1.0
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), images, base.depths,
                           base.depth_stds, base.poses, jnp.asarray(K),
                           xyz, xyz)
    enc = model.apply(variables, images, base.depths, base.depth_stds,
                      base.poses, jnp.asarray(K), method="encode")

    from diner_tpu.geometry import gen_rays

    img_rays = gen_rays(base.poses[:, 0], jnp.asarray(K[:, 0]), 8, 8, 1.0, 3.0)
    cfg = RenderConfig(n_samples=8, n_depth_candidates=32, n_gaussian=3,
                       n_prior_anchors=8, anchor_field_depth=True)

    def render_with(m):
        return render_image(
            lambda p, d, aux=None: m.apply(variables, enc, p, d, aux,
                                           method="field"),
            jax.random.PRNGKey(2), img_rays, enc, cfg, chunk=64)

    rgb_exact, _ = render_with(model)
    rgb_dense, _ = render_with(model.clone(latent_anchors=16))  # A >= NS
    rgb_coarse, _ = render_with(model.clone(latent_anchors=4))  # A < NS

    np.testing.assert_allclose(np.asarray(rgb_dense), np.asarray(rgb_exact),
                               atol=2e-5)
    mse = float(np.mean((np.asarray(rgb_coarse) - np.asarray(rgb_exact)) ** 2))
    assert -10 * np.log10(max(mse, 1e-12)) > 30.0, f"coarse-anchor mse {mse}"


def test_render_image_paired_prior_gather_close_to_plain():
    """End-to-end render with RenderConfig.paired_prior_gather must stay
    close to the plain anchor render (same anchors, bf16-table rounding
    only) — guards the full sampler->aux->field wiring of the r5 paired
    fetch, not just the fetch function."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.models import PixelNeRF
    from diner_tpu.renderer import render_image

    H = W = 32
    ds = SyntheticSphereDataset(n_scenes=1, n_views=3, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    nerf = PixelNeRF(encoder_layers=2, d_hidden=64, n_blocks=3,
                     combine_layer=2, image_padding=8, padding_pe=2)
    variables = nerf.init(jax.random.PRNGKey(0), batch["src_rgbs"],
                          batch["src_depths"], batch["src_depth_stds"],
                          batch["src_extrinsics"], batch["src_intrinsics"],
                          jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)))
    enc = nerf.apply(variables, batch["src_rgbs"], batch["src_depths"],
                     batch["src_depth_stds"], batch["src_extrinsics"],
                     batch["src_intrinsics"], method="encode")
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, ds.znear, ds.zfar)
    base = RenderConfig(n_samples=8, n_depth_candidates=64, n_gaussian=3,
                        n_prior_anchors=16, eval_chunk_rays=256)

    outs = {}
    for name, cfg in (("plain", base),
                      ("paired", dataclasses.replace(
                          base, paired_prior_gather=True))):
        rgb, depth = render_image(
            lambda p, d, aux=None: nerf.apply(variables, enc, p, d, aux,
                                              method="field"),
            jax.random.PRNGKey(7), rays, enc, cfg, chunk=256)
        outs[name] = (np.asarray(rgb), np.asarray(depth))
        assert np.isfinite(outs[name][0]).all()

    diff = np.abs(outs["plain"][0] - outs["paired"][0])
    mse = float((diff ** 2).mean())
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, f"paired render diverges from plain ({psnr:.1f} dB)"
