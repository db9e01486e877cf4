"""Depth-guided sampler: golden erf values, occlusion weighting, fill logic."""

import math

import numpy as np
import jax
import jax.numpy as jnp
from scipy.special import erf as scipy_erf

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.sampler import (
    sample_stratified, surface_likelihoods, sample_depthguided, fill_uniform,
)


def _make_enc(SB=1, NV=1, H=16, W=16, depth=2.0, std=0.1, f=20.0):
    """Identity camera at origin looking +z; constant-depth plane with
    constant sigma and camera-facing normals."""
    K = np.zeros((SB, NV, 3, 3), np.float32)
    K[..., 0, 0] = f
    K[..., 1, 1] = f
    K[..., 0, 2] = W / 2
    K[..., 1, 2] = H / 2
    K[..., 2, 2] = 1
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (SB, NV, 4, 4)).copy()
    depths = np.full((SB, NV, H, W, 1), depth, np.float32)
    stds = np.full((SB, NV, H, W, 1), std, np.float32)
    normals = np.zeros((SB, NV, H, W, 3), np.float32)
    normals[..., 2] = -1.0
    return SceneEncoding(
        latent=jnp.zeros((SB, NV, H // 2, W // 2, 8)),
        depths=jnp.asarray(depths), depth_stds=jnp.asarray(stds),
        normals=jnp.asarray(normals), poses=jnp.asarray(ext),
        focal=jnp.asarray(K[..., np.array([0, 1]), np.array([0, 1])]),
        c=jnp.asarray(K[..., :2, 2]), feature_padding=0)


def _center_rays(SB=1, NR=1, near=1.0, far=3.0):
    rays = np.zeros((SB, NR, 8), np.float32)
    rays[..., 5] = 1.0  # dir +z through optical center
    rays[..., 6] = near
    rays[..., 7] = far
    return jnp.asarray(rays)


def test_stratified_in_bins():
    rays = _center_rays(2, 5)
    z = np.asarray(sample_stratified(jax.random.PRNGKey(0), rays, 100))
    assert z.shape == (2, 5, 100)
    # each sample inside its own stratum
    edges_lo = 1.0 + np.arange(100) / 100 * 2.0
    edges_hi = edges_lo + 2.0 / 100
    assert (z >= edges_lo - 1e-6).all() and (z <= edges_hi + 1e-6).all()


def test_surface_likelihood_golden_erf():
    """Candidate bins near the surface carry exactly the N(d, sigma^2) mass."""
    d0, std, near, far, NC = 2.0, 0.05, 1.0, 3.0, 200
    enc = _make_enc(depth=d0, std=std)
    rays = _center_rays(near=near, far=far)
    # deterministic candidates: bin centers
    step = (far - near) / NC
    z = jnp.asarray((near + (np.arange(NC) + 0.5) * step)[None, None].astype(np.float32))

    p, opaque = surface_likelihoods(rays, z, enc, depth_diff_max=0.5)
    p = np.asarray(p)[0, 0]

    zc = np.asarray(z)[0, 0]
    # z_cam == z here (ray along +z). Expected erf mass where |d0 - z| < 0.5:
    expect = 0.5 * np.abs(
        scipy_erf((zc + step / 2 - d0) / (std * math.sqrt(2)))
        - scipy_erf((zc - step / 2 - d0) / (std * math.sqrt(2))))
    expect[np.abs(d0 - zc) >= 0.5] = 0.0
    np.testing.assert_allclose(p, expect, rtol=1e-4, atol=1e-6)
    # total mass ~1 (surface well inside [near, far])
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-3)


def test_likelihood_gates():
    """Back-facing normals and invalid sigma zero the likelihood."""
    enc = _make_enc(depth=2.0, std=0.1)
    rays = _center_rays()
    z = jnp.asarray(np.array([[[2.0]]], np.float32))
    p, _ = surface_likelihoods(rays, z, enc, 0.5)
    assert float(p[0, 0, 0]) > 0

    enc_back = enc.replace(normals=-enc.normals)  # normals point away
    p2, _ = surface_likelihoods(rays, z, enc_back, 0.5)
    assert float(p2[0, 0, 0]) == 0

    enc_nostd = enc.replace(depth_stds=jnp.zeros_like(enc.depth_stds))
    p3, _ = surface_likelihoods(rays, z, enc_nostd, 0.5)
    assert float(p3[0, 0, 0]) == 0


def test_occlusion_is_exclusive_cumprod():
    enc = _make_enc(depth=2.0, std=0.3)
    rays = _center_rays()
    z = sample_stratified(jax.random.PRNGKey(1), rays, 50)
    p, opaque = surface_likelihoods(rays, z, enc, depth_diff_max=1.5)
    p_np, o_np = np.asarray(p)[0, 0], np.asarray(opaque)[0, 0]
    trans = np.cumprod(1 - p_np)
    expect = p_np.copy()
    expect[1:] *= trans[:-1]
    np.testing.assert_allclose(o_np, expect, rtol=1e-5, atol=1e-7)


def test_fill_uniform_all_empty():
    rays = _center_rays(1, 3, near=1.0, far=3.0)
    z = jnp.zeros((1, 3, 10))
    out = np.asarray(fill_uniform(jax.random.PRNGKey(0), z, rays))
    assert (np.diff(out, axis=-1) >= 0).all()  # sorted
    lo = 1.0 + np.arange(10) * 0.2
    assert (out >= lo - 1e-6).all() and (out <= lo + 0.2 + 1e-6).all()


def test_fill_uniform_partial():
    rays = _center_rays(1, 1, near=0.0, far=1.0)
    z = jnp.asarray(np.array([[[0.0, 0.42, 0.0, 0.17]]], np.float32))
    out = np.asarray(fill_uniform(jax.random.PRNGKey(0), z, rays))[0, 0]
    assert (np.diff(out) >= 0).all()
    kept = np.isclose(out[:, None], [0.42, 0.17], atol=1e-6).any(axis=1)
    assert kept.sum() == 2  # existing samples survive
    # two filled slots drawn from strata of width 0.5: [0, 0.5), [0.5, 1.0)
    filled = np.sort(out[~kept])
    assert len(filled) == 2
    assert 0.0 <= filled[0] < 0.5 and 0.5 <= filled[1] <= 1.0


def test_sample_depthguided_concentrates_near_surface():
    d0, std = 2.0, 0.02
    enc = _make_enc(depth=d0, std=std)
    rays = _center_rays(near=1.0, far=3.0)
    cfg = RenderConfig(n_samples=40, n_depth_candidates=500, n_gaussian=15)
    z = np.asarray(sample_depthguided(jax.random.PRNGKey(0), rays, enc, cfg))[0, 0]
    assert z.shape == (40,)
    assert (np.diff(z) >= 0).all()
    near_surface = np.abs(z - d0) < 0.06
    assert near_surface.sum() >= 20  # most samples hug the surface
    assert (z >= 1.0 - 4 * std).all() and (z <= 3.0 + 4 * std).all()


def test_sample_depthguided_no_surface_falls_back_uniform():
    enc = _make_enc(depth=2.0, std=0.1)
    enc = enc.replace(depth_stds=jnp.zeros_like(enc.depth_stds))  # no evidence
    rays = _center_rays(near=1.0, far=3.0)
    cfg = RenderConfig(n_samples=16, n_depth_candidates=100, n_gaussian=4)
    z = np.asarray(sample_depthguided(jax.random.PRNGKey(0), rays, enc, cfg))[0, 0]
    lo = 1.0 + np.arange(16) * (2.0 / 16)
    assert (z >= lo - 1e-5).all() and (z <= lo + 2.0 / 16 + 1e-5).all()


def test_gather_priors_matches_separate_indexers():
    """The fused single-gather path must equal the three index_* calls exactly,
    including out-of-frame behavior of each padding mode."""
    from diner_tpu.sampler import gather_priors
    from diner_tpu.models import index_depth, index_depth_std, index_normal

    rng = np.random.RandomState(0)
    SB, NV, H, W, N = 2, 3, 20, 24, 500
    enc = _make_enc(SB=SB, NV=NV, H=H, W=W)
    # structured maps so mismatches are visible
    enc = enc.replace(
        depths=jnp.asarray(rng.rand(SB, NV, H, W, 1).astype(np.float32) + 0.5),
        depth_stds=jnp.asarray(rng.rand(SB, NV, H, W, 1).astype(np.float32) * 0.1),
        normals=jnp.asarray(rng.randn(SB, NV, H, W, 3).astype(np.float32)))
    # coordinates spanning inside, slightly-outside, and beyond-pad regions
    uv = jnp.asarray((rng.rand(SB, NV, N, 2).astype(np.float32) * 2 - 1) * 12.0)

    d, s, n = gather_priors(enc, uv)
    np.testing.assert_allclose(np.asarray(d), np.asarray(index_depth(enc, uv)[..., 0]),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(s), np.asarray(index_depth_std(enc, uv)[..., 0]),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(n), np.asarray(index_normal(enc, uv)),
                               rtol=1e-6, atol=0)


def test_weighted_mean_and_std_util():
    from diner_tpu.utils import weighted_mean_and_std

    x = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0]))
    w = jnp.asarray(np.array([0.0, 1.0, 1.0, 0.0]))
    m, s = weighted_mean_and_std(x, w, axis=0)
    np.testing.assert_allclose(float(m), 2.5)
    np.testing.assert_allclose(float(s), 0.5)


def test_anchor_priors_constant_maps_exact():
    """Anchors vs exact on constant maps: identical for any anchor count."""
    enc = _make_enc(depth=2.0, std=0.05)
    rays = _center_rays(near=1.0, far=3.0)
    step = 2.0 / 200
    z = jnp.asarray((1.0 + (np.arange(200) + 0.5) * step)[None, None].astype(np.float32))
    p_exact, _ = surface_likelihoods(rays, z, enc, 0.5)
    p_anchor, _ = surface_likelihoods(rays, z, enc, 0.5, n_prior_anchors=16)
    np.testing.assert_allclose(np.asarray(p_exact), np.asarray(p_anchor),
                               rtol=1e-6)


def test_anchor_priors_degenerate_chord():
    """Ray through the source optical center: all candidates project to one
    pixel (zero chord) — the dd~0 branch must reproduce the exact path."""
    rng = np.random.RandomState(1)
    enc = _make_enc(depth=2.0, std=0.05)
    enc = enc.replace(depths=jnp.asarray(
        rng.rand(1, 1, 16, 16, 1).astype(np.float32) + 1.0))
    rays = _center_rays(near=1.0, far=3.0)  # +z through the principal point
    z = sample_stratified(jax.random.PRNGKey(0), rays, 100)
    p_exact, _ = surface_likelihoods(rays, z, enc, 2.0)
    p_anchor, _ = surface_likelihoods(rays, z, enc, 2.0, n_prior_anchors=8)
    np.testing.assert_allclose(np.asarray(p_exact), np.asarray(p_anchor),
                               rtol=1e-6)


def test_anchor_priors_short_chord_matches_exact():
    """Off-axis ray with a ~2 px epipolar chord: with anchors spaced much
    finer than a pixel, each candidate's anchor shares its nearest pixel, so
    the likelihoods match the exact path except in a razor-thin rounding band."""
    rng = np.random.RandomState(2)
    H = W = 16
    enc = _make_enc(H=H, W=W, depth=2.0, std=0.05)
    enc = enc.replace(
        depths=jnp.asarray(rng.rand(1, 1, H, W, 1).astype(np.float32) + 1.0),
        depth_stds=jnp.asarray(
            rng.rand(1, 1, H, W, 1).astype(np.float32) * 0.2 + 0.01))
    rays = np.zeros((1, 1, 8), np.float32)
    rays[..., 0] = 0.11  # offset origin -> u = f*0.11/z + cx sweeps ~1.5 px
    rays[..., 5] = 1.0
    rays[..., 6] = 1.0
    rays[..., 7] = 3.0
    rays = jnp.asarray(rays)
    z = sample_stratified(jax.random.PRNGKey(0), rays, 300)
    p_exact, _ = surface_likelihoods(rays, z, enc, 5.0)
    p_anchor, _ = surface_likelihoods(rays, z, enc, 5.0, n_prior_anchors=256)
    e, a = np.asarray(p_exact), np.asarray(p_anchor)
    match = np.isclose(e, a, rtol=1e-5, atol=1e-8)
    assert match.mean() >= 0.98, f"only {match.mean():.3f} matched"
    # total likelihood mass preserved
    np.testing.assert_allclose(e.sum(), a.sum(), rtol=0.05)


def test_anchor_remap_dot_matches_take():
    from diner_tpu.sampler.depth_guided import _remap_monotone

    rng = np.random.RandomState(3)
    vals = jnp.asarray(rng.rand(2, 3, 16, 5).astype(np.float32))
    a = jnp.asarray(np.sort(rng.randint(0, 16, (2, 3, 40)), axis=-1))
    out_take = np.asarray(_remap_monotone(vals, a, "take"))
    out_dot = np.asarray(_remap_monotone(vals, a, "dot"))
    # bf16 one-hot matmul: exact selection, values rounded to bf16
    np.testing.assert_allclose(out_take, out_dot, rtol=1e-2, atol=1e-3)


def test_sample_depthguided_anchor_concentrates():
    d0, std = 2.0, 0.02
    enc = _make_enc(depth=d0, std=std)
    rays = _center_rays(near=1.0, far=3.0)
    cfg = RenderConfig(n_samples=40, n_depth_candidates=500, n_gaussian=15,
                       n_prior_anchors=32)
    z = np.asarray(sample_depthguided(jax.random.PRNGKey(0), rays, enc, cfg))[0, 0]
    assert (np.abs(z - d0) < 0.06).sum() >= 20


def test_prior_stride_exact_on_smooth_maps():
    """stride=1 vs stride=4 on constant maps: identical; on a smooth scene,
    samples still concentrate at the surface."""
    d0, std = 2.0, 0.05
    enc = _make_enc(depth=d0, std=std)
    rays = _center_rays(near=1.0, far=3.0)
    step = 2.0 / 200
    z = jnp.asarray((1.0 + (np.arange(200) + 0.5) * step)[None, None].astype(np.float32))
    p1, _ = surface_likelihoods(rays, z, enc, 0.5, prior_stride=1)
    p4, _ = surface_likelihoods(rays, z, enc, 0.5, prior_stride=4)
    # constant maps -> identical regardless of stride
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p4), rtol=1e-6)

    cfg = RenderConfig(n_samples=16, n_depth_candidates=200, n_gaussian=4,
                       prior_stride=4)
    zs = np.asarray(sample_depthguided(jax.random.PRNGKey(0), rays, enc, cfg))[0, 0]
    assert (np.abs(zs - d0) < 0.2).sum() >= 10


def test_pallas_remap_matches_take():
    """MXU one-hot remap kernel (interpret mode) vs take_along_axis."""
    from diner_tpu.sampler.pallas_remap import remap_anchors_pallas

    rng = np.random.RandomState(7)
    G, C, K, NC = 19, 5, 16, 40  # G deliberately not a multiple of tg
    vals = jnp.asarray(rng.rand(G, C, K).astype(np.float32))
    a = jnp.asarray(np.sort(rng.randint(0, K, (G, NC)), axis=-1))
    out = np.asarray(remap_anchors_pallas(a, vals, tg=8, interpret=True))
    ref = np.take_along_axis(np.asarray(vals),
                             np.asarray(a)[:, None, :].repeat(C, 1), axis=-1)
    # exact selection; values pass through bf16 once
    np.testing.assert_allclose(out, ref, rtol=8e-3, atol=1e-3)


def test_fused_likelihood_kernel_matches_fallback():
    """Pallas fused remap+likelihood (interpret mode) vs the XLA math."""
    from diner_tpu.sampler.pallas_likelihood import likelihood_from_anchors

    rng = np.random.RandomState(11)
    G, A, NC = 13, 16, 120  # G deliberately not a multiple of tg
    depth = rng.rand(G, A).astype(np.float32) * 2.0 + 1.0
    std = (rng.rand(G, A).astype(np.float32) * 0.3)
    std[rng.rand(G, A) < 0.2] = 0.0          # some invalid-sigma anchors
    cos = (rng.rand(G, A).astype(np.float32) - 0.7)  # mixed-sign gate
    vals = jnp.asarray(np.stack([depth, std, cos], axis=1))  # (G, 3, A)
    a = jnp.asarray(np.sort(rng.randint(0, A, (G, NC)), axis=-1))
    z_cam = jnp.asarray((rng.rand(G, NC).astype(np.float32) * 2.0 + 1.0))
    half_step = jnp.asarray(rng.rand(G, 1).astype(np.float32) * 0.01 + 0.001)
    ddm = 0.5

    out = np.asarray(likelihood_from_anchors(a, vals, z_cam, half_step, ddm,
                                             tg=8, interpret=True))

    an = np.asarray(a)
    d = np.take_along_axis(depth, an, axis=-1)
    s = np.take_along_axis(std, an, axis=-1)
    c = np.take_along_axis(cos, an, axis=-1)
    z = np.asarray(z_cam)
    hs = np.asarray(half_step)
    valid = (c <= 0) & (np.abs(d - z) < ddm) & (s != 0)
    sstd = np.where(s == 0, 1.0, s) * math.sqrt(2.0)
    hi = scipy_erf((z + hs - d) / sstd)
    lo = scipy_erf((z - hs - d) / sstd)
    ref = np.where(valid, 0.5 * np.abs(hi - lo), 0.0)
    # erf polynomial (A&S 7.1.26): max abs err ~2e-6
    np.testing.assert_allclose(out, ref, atol=1e-5, rtol=1e-4)


def test_surface_likelihoods_returns_anchor_aux():
    enc = _make_enc(depth=2.0, std=0.05)
    rays = _center_rays(near=1.0, far=3.0)
    z = sample_stratified(jax.random.PRNGKey(0), rays, 100)
    p, _, aux = surface_likelihoods(rays, z, enc, 0.5, n_prior_anchors=8,
                                    return_aux=True)
    assert aux is not None
    assert aux.depth.shape == (1, 1, 1, 8)
    assert aux.uv0.shape == (1, 1, 1, 2)
    p2, _, aux2 = surface_likelihoods(rays, z, enc, 0.5, return_aux=True)
    assert aux2 is None


def test_pallas_remap_exact_f32():
    """exact=True one-hot remap: bit-exact f32 selection (interpret mode)."""
    from diner_tpu.sampler.pallas_remap import remap_anchors_pallas

    rng = np.random.RandomState(9)
    G, C, K, NC = 10, 1, 16, 40
    vals = jnp.asarray(rng.rand(G, C, K).astype(np.float32))
    a = jnp.asarray(np.sort(rng.randint(0, K, (G, NC)), axis=-1))
    out = np.asarray(remap_anchors_pallas(a, vals, tg=8, interpret=True,
                                          exact=True))
    ref = np.take_along_axis(np.asarray(vals),
                             np.asarray(a)[:, None, :].repeat(C, 1), axis=-1)
    np.testing.assert_array_equal(out, ref)


def test_anchor_field_depth_matches_index_depth():
    """Field ref-depth from the sampler's anchor table vs per-sample
    nearest-pixel gathers: identical almost everywhere when anchors are
    spaced much finer than a pixel."""
    from diner_tpu.geometry import transform_points, project_points
    from diner_tpu.models.pixelnerf import _anchor_ref_depth, index_depth

    rng = np.random.RandomState(5)
    H = W = 16
    enc = _make_enc(H=H, W=W, depth=2.0, std=0.05)
    enc = enc.replace(depths=jnp.asarray(
        rng.rand(1, 1, H, W, 1).astype(np.float32) + 1.0))
    rays = np.zeros((1, 2, 8), np.float32)
    rays[..., 0] = [[0.11, -0.07]]   # off-axis -> short epipolar chords
    rays[..., 5] = 1.0
    rays[..., 6] = 1.0
    rays[..., 7] = 3.0
    rays = jnp.asarray(rays)
    z_cand = sample_stratified(jax.random.PRNGKey(0), rays, 200)
    _, _, aux = surface_likelihoods(rays, z_cand, enc, 0.5,
                                    n_prior_anchors=512, return_aux=True)

    # arbitrary per-ray samples inside [near, far], ray-major order
    NS = 24
    z = jnp.asarray(
        (1.0 + rng.rand(1, 2, NS).astype(np.float32) * 2.0))
    pts = rays[:, :, None, :3] + z[..., None] * rays[:, :, None, 3:6]
    SB, NR = 1, 2
    pts = pts.reshape(SB, NR * NS, 3)
    xyz_nv = jnp.broadcast_to(pts[:, None], (SB, 1, NR * NS, 3))
    xyz_cam = transform_points(enc.poses, xyz_nv)
    uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)

    got = np.asarray(_anchor_ref_depth(aux, uv))
    ref = np.asarray(index_depth(enc, uv)[..., 0])
    match = np.isclose(got, ref, rtol=1e-6)
    assert match.mean() >= 0.95, f"only {match.mean():.3f} matched"


def test_fused_chord_kernel_matches_fallback():
    """Pallas fused chord+likelihood v2 (interpret mode) vs the portable
    XLA anchor path: same enc/rays/z must give the same (SB, NR, NC)
    likelihoods up to the erf polynomial and boundary anchor-id flips from
    the kernel's reassociated chord arithmetic (t = (P0+z*P1)*inv_dd/zc
    instead of /(zc*dd)) — candidates whose chord parameter sits within
    1e-5 of an anchor boundary are excluded from the comparison."""
    import os

    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate
    from diner_tpu.geometry import gen_rays
    from diner_tpu.sampler.depth_guided import (sample_stratified,
                                                surface_likelihoods)
    from diner_tpu.sampler.pallas_likelihood import likelihood_from_chord

    ds = SyntheticSphereDataset(n_scenes=1, n_views=3, H=48, W=48)
    batch = collate([ds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    from diner_tpu.models import PixelNeRF

    nerf = PixelNeRF(encoder_layers=2, d_hidden=64, n_blocks=3,
                     combine_layer=2)
    variables = nerf.init(jax.random.PRNGKey(0), batch["src_rgbs"],
                          batch["src_depths"], batch["src_depth_stds"],
                          batch["src_extrinsics"], batch["src_intrinsics"],
                          jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)))
    enc = nerf.apply(variables, batch["src_rgbs"], batch["src_depths"],
                     batch["src_depth_stds"], batch["src_extrinsics"],
                     batch["src_intrinsics"], method="encode")
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    48, 48, ds.znear, ds.zfar).reshape(1, 48 * 48, 8)
    rays = rays[:, :256]
    NC, A, ddm = 120, 32, 0.5
    z = sample_stratified(jax.random.PRNGKey(1), rays, NC)

    # portable fallback (use_tpu_kernels() is False on CPU)
    p_ref, opq_ref = surface_likelihoods(rays, z, enc, ddm,
                                         n_prior_anchors=A)[:2]

    # fused kernel, interpret mode, fed from the fallback's own chord state
    from diner_tpu.sampler import depth_guided as dg

    SB, NR, _ = z.shape
    NV = enc.poses.shape[1]
    dirs = jnp.broadcast_to(rays[:, None, :, 3:6], (SB, NV, NR, 3))
    dirs_cam = jnp.einsum("svij,svrj->svri", enc.poses[..., :3, :3], dirs)
    o_nv = jnp.broadcast_to(rays[:, None, :, :3], (SB, NV, NR, 3))
    from diner_tpu.geometry import transform_points

    o_cam = transform_points(enc.poses, o_nv)
    wh = jnp.asarray(enc.image_shape, rays.dtype)
    f2 = (enc.focal * 2.0 / wh)[:, :, None]
    cterm = (enc.c * 2.0 / wh - 1.0)[:, :, None]
    U0 = o_cam[..., :2] * f2 + o_cam[..., 2:3] * cterm
    U1 = dirs_cam[..., :2] * f2 + dirs_cam[..., 2:3] * cterm
    w0, w1 = o_cam[..., 2], dirs_cam[..., 2]
    z0, zL = z[:, None, :, 0], z[:, None, :, -1]
    den0, denL = w0 + z0 * w1, w0 + zL * w1
    chord_ok = (den0 > 1e-9) & (denL > 1e-9)
    uv0 = jnp.where(chord_ok[..., None],
                    (U0 + z0[..., None] * U1)
                    / jnp.where(den0 == 0, 1.0, den0)[..., None], 0.0)
    uvL = jnp.where(chord_ok[..., None],
                    (U0 + zL[..., None] * U1)
                    / jnp.where(denL == 0, 1.0, denL)[..., None], 0.0)
    duv = uvL - uv0
    dd = jnp.sum(duv * duv, axis=-1)
    P0 = jnp.sum((U0 - w0[..., None] * uv0) * duv, axis=-1)
    P1 = jnp.sum((U1 - w1[..., None] * uv0) * duv, axis=-1)
    ad, astd, anrm = dg._gather_anchor_priors(enc, uv0, duv, A)
    acos = jnp.sum(dirs_cam[:, :, :, None, :] * anrm, axis=-1)
    half_step = ((rays[..., 7] - rays[..., 6]) / (2 * NC))
    scal = jnp.stack([
        w0, w1, P0, P1, 1.0 / jnp.where(dd == 0, 1.0, dd),
        (dd > 1e-12).astype(rays.dtype), chord_ok.astype(rays.dtype),
        jnp.broadcast_to(half_step[:, None], (SB, NV, NR))], axis=-1)
    vals = jnp.stack([ad, astd, acos], axis=3)
    p_k = likelihood_from_chord(z, scal.astype(jnp.float32),
                                vals.astype(jnp.float32), A, ddm,
                                tg=8, interpret=True)

    # exclude anchor-boundary candidates (reassociation can flip the id)
    z_nv = z[:, None]
    z_cam = w0[..., None] + z_nv * w1[..., None]
    zs = jnp.where(jnp.abs(z_cam) > 1e-9, z_cam, 1.0)
    t = (P0[..., None] + z_nv * P1[..., None]) \
        / (zs * jnp.where(dd == 0, 1.0, dd)[..., None])
    s_par = jnp.where(dd[..., None] > 1e-12, t, 0.5)
    frac = jnp.clip(s_par, 0.0, 1.0) * A
    safe = jnp.abs(frac - jnp.round(frac)) > 1e-5

    p_v = jnp.max(jnp.where(safe, p_k, 0.0), axis=1)
    p_r = jnp.max(jnp.where(safe,
                            # rebuild the per-view fallback p to apply the
                            # same mask before the view max
                            _per_view_anchor_p(enc, rays, z, A, ddm), 0.0),
                  axis=1)
    np.testing.assert_allclose(np.asarray(p_v), np.asarray(p_r),
                               atol=2e-5, rtol=1e-3)


def _per_view_anchor_p(enc, rays, z, A, ddm):
    """Per-view (pre-max) likelihoods via the portable fallback math."""
    import math as _math

    from diner_tpu.geometry import transform_points
    from diner_tpu.sampler import depth_guided as dg
    from scipy.special import erf as scipy_erf2

    SB, NR, NC = z.shape
    NV = enc.poses.shape[1]
    dirs = jnp.broadcast_to(rays[:, None, :, 3:6], (SB, NV, NR, 3))
    dirs_cam = jnp.einsum("svij,svrj->svri", enc.poses[..., :3, :3], dirs)
    o_nv = jnp.broadcast_to(rays[:, None, :, :3], (SB, NV, NR, 3))
    o_cam = transform_points(enc.poses, o_nv)
    wh = jnp.asarray(enc.image_shape, rays.dtype)
    f2 = (enc.focal * 2.0 / wh)[:, :, None]
    cterm = (enc.c * 2.0 / wh - 1.0)[:, :, None]
    U0 = o_cam[..., :2] * f2 + o_cam[..., 2:3] * cterm
    U1 = dirs_cam[..., :2] * f2 + dirs_cam[..., 2:3] * cterm
    w0, w1 = o_cam[..., 2], dirs_cam[..., 2]
    z0, zL = z[:, None, :, 0], z[:, None, :, -1]
    den0, denL = w0 + z0 * w1, w0 + zL * w1
    chord_ok = (den0 > 1e-9) & (denL > 1e-9)
    uv0 = jnp.where(chord_ok[..., None],
                    (U0 + z0[..., None] * U1)
                    / jnp.where(den0 == 0, 1.0, den0)[..., None], 0.0)
    uvL = jnp.where(chord_ok[..., None],
                    (U0 + zL[..., None] * U1)
                    / jnp.where(denL == 0, 1.0, denL)[..., None], 0.0)
    duv = uvL - uv0
    dd = jnp.sum(duv * duv, axis=-1)
    P0 = jnp.sum((U0 - w0[..., None] * uv0) * duv, axis=-1)
    P1 = jnp.sum((U1 - w1[..., None] * uv0) * duv, axis=-1)
    z_nv = z[:, None]
    z_cam = w0[..., None] + z_nv * w1[..., None]
    front = chord_ok[..., None] & (z_cam > 1e-9)
    zs = jnp.where(jnp.abs(z_cam) > 1e-9, z_cam, 1.0)
    t = (P0[..., None] + z_nv * P1[..., None]) \
        / (zs * jnp.where(dd == 0, 1.0, dd)[..., None])
    s_par = jnp.where(dd[..., None] > 1e-12, t, 0.5)
    a = jnp.clip((jnp.clip(s_par, 0.0, 1.0) * A).astype(jnp.int32), 0, A - 1)
    ad, astd, anrm = dg._gather_anchor_priors(enc, uv0, duv, A)
    acos = jnp.sum(dirs_cam[:, :, :, None, :] * anrm, axis=-1)
    vals = jnp.stack([ad, astd, acos], axis=-1)
    out = dg._remap_monotone(vals, a)
    d, s_, c = out[..., 0], out[..., 1], out[..., 2]
    s_ = jnp.where(front, s_, 0.0)
    step = ((rays[..., 7] - rays[..., 6]) / NC)[:, None, :, None]
    valid = (c <= 0) & (jnp.abs(d - z_cam) < ddm) & (s_ != 0)
    sstd = jnp.where(s_ == 0, 1.0, s_) * _math.sqrt(2.0)
    hi = np.asarray(scipy_erf2((np.asarray(z_cam) + np.asarray(step) / 2
                                - np.asarray(d)) / np.asarray(sstd)))
    lo = np.asarray(scipy_erf2((np.asarray(z_cam) - np.asarray(step) / 2
                                - np.asarray(d)) / np.asarray(sstd)))
    return jnp.where(valid, 0.5 * jnp.abs(hi - lo), 0.0)


def test_paired_prior_gather_matches_plain():
    """RenderConfig.paired_prior_gather: the 2x2-packed pair fetch must be
    BIT-IDENTICAL to the per-anchor gather when anchor spacing <= 1 px per
    axis (chord shorter than A px), and within the anchor-discretization
    error class otherwise."""
    from diner_tpu.models import PixelNeRF
    from diner_tpu.data import SyntheticSphereDataset, collate
    from diner_tpu.geometry import gen_rays, transform_points
    from diner_tpu.sampler import depth_guided as dg

    ds = SyntheticSphereDataset(n_scenes=1, n_views=3, H=64, W=64)
    batch = collate([ds[0]])
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}
    nerf = PixelNeRF(encoder_layers=2, d_hidden=64, n_blocks=3,
                     combine_layer=2)
    variables = nerf.init(jax.random.PRNGKey(0), batch["src_rgbs"],
                          batch["src_depths"], batch["src_depth_stds"],
                          batch["src_extrinsics"], batch["src_intrinsics"],
                          jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)))
    enc = nerf.apply(variables, batch["src_rgbs"], batch["src_depths"],
                     batch["src_depth_stds"], batch["src_extrinsics"],
                     batch["src_intrinsics"], method="encode")
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    64, 64, ds.znear, ds.zfar).reshape(1, -1, 8)[:, 800:1056]
    SB, NR, _ = rays.shape
    NV = enc.poses.shape[1]
    z = dg.sample_stratified(jax.random.PRNGKey(1), rays, 64)

    # chord state (as surface_likelihoods computes it)
    dirs = jnp.broadcast_to(rays[:, None, :, 3:6], (SB, NV, NR, 3))
    dirs_cam = jnp.einsum("svij,svrj->svri", enc.poses[..., :3, :3], dirs)
    o_nv = jnp.broadcast_to(rays[:, None, :, :3], (SB, NV, NR, 3))
    o_cam = transform_points(enc.poses, o_nv)
    wh = jnp.asarray(enc.image_shape, rays.dtype)
    f2 = (enc.focal * 2.0 / wh)[:, :, None]
    cterm = (enc.c * 2.0 / wh - 1.0)[:, :, None]
    U0 = o_cam[..., :2] * f2 + o_cam[..., 2:3] * cterm
    U1 = dirs_cam[..., :2] * f2 + dirs_cam[..., 2:3] * cterm
    w0, w1 = o_cam[..., 2], dirs_cam[..., 2]
    z0, zL = z[:, None, :, 0], z[:, None, :, -1]
    den0, denL = w0 + z0 * w1, w0 + zL * w1
    ok = (den0 > 1e-9) & (denL > 1e-9)
    uv0 = jnp.where(ok[..., None], (U0 + z0[..., None] * U1)
                    / jnp.where(den0 == 0, 1.0, den0)[..., None], 0.0)
    uvL = jnp.where(ok[..., None], (U0 + zL[..., None] * U1)
                    / jnp.where(denL == 0, 1.0, denL)[..., None], 0.0)
    duv = uvL - uv0

    W = H = 64
    for A in (64, 128):
        d0, s0, n0 = dg._gather_anchor_priors(enc, uv0, duv, A)
        d1, s1, n1 = dg._gather_anchor_priors_paired(enc, uv0, duv, A)
        # per-(view, ray) exactness predicate: spacing <= 1 px per axis
        span_px = jnp.stack([jnp.abs(duv[..., 0]) * 0.5 * W,
                             jnp.abs(duv[..., 1]) * 0.5 * H], -1)
        exact_vr = jnp.max(span_px, -1) / A <= 1.0          # (SB, NV, NR)
        frac_exact = float(jnp.mean(exact_vr.astype(jnp.float32)))
        assert frac_exact > 0.5, "test geometry gives too few short chords"
        m = exact_vr[..., None]
        # On short chords the paired fetch reads the SAME pixel as the plain
        # path; only the bf16 table rounding differs: depth keeps ~f24 via
        # the hi/lo split (rel err <= ~2^-16), std/normal round to bf16
        # (rel err <= 2^-8).
        me, pe = (np.asarray(jnp.where(m, d0, 0.0)),
                  np.asarray(jnp.where(m, d1, 0.0)))
        np.testing.assert_allclose(pe, me, rtol=3e-5, atol=1e-6,
                                   err_msg=f"paired depth drifts (A={A})")
        np.testing.assert_allclose(np.asarray(jnp.where(m, s1, 0.0)),
                                   np.asarray(jnp.where(m, s0, 0.0)),
                                   rtol=1e-2, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jnp.where(m[..., None], n1, 0.0)),
            np.asarray(jnp.where(m[..., None], n0, 0.0)),
            rtol=1e-2, atol=5e-3)
        # the PIXEL choice must be identical on short chords: nonzero
        # pattern of std (validity gate input) matches exactly
        np.testing.assert_array_equal(
            np.asarray(jnp.where(m, s1, 0.0)) == 0,
            np.asarray(jnp.where(m, s0, 0.0)) == 0)
        # long chords: bounded, not exact — depths stay in table range
        assert float(jnp.max(jnp.abs(jnp.where(m, 0.0, d0 - d1)))) < 2.0
