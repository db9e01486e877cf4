"""Round-2 perf experiments on the real chip. Usage:

    python scripts/profile_r2.py remap        # anchor->candidate remap variants
    python scripts/profile_r2.py components   # sampler / field / encode breakdown
    python scripts/profile_r2.py chunks       # full render at several chunk sizes

Each experiment prints one JSON line. Keep programs small; the axon tunnel's
remote compiles are slow for big graphs (memory: 5-25 min for the full render).
"""

from __future__ import annotations

import functools
import json
import os
import sys

import jax

if os.environ.get("JAX_PLATFORMS", "") != "cpu":
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from diner_tpu.utils.profiling import benchmark


def report(name, res, **extra):
    print(json.dumps({"exp": name, "min_s": round(res["min_s"], 5),
                      "median_s": round(res["median_s"], 5), **extra}),
          flush=True)


# ---------------------------------------------------------------- remap
def run_remap():
    """Anchor-table -> per-candidate remap: which formulation is fastest?

    B = SB*NV*NR collapsed batch; vals (B, K, C) anchor priors; a (B, NC)
    monotone anchor ids. Want out (B, NC, C) = vals[b, a[b, t], :].
    """
    NR, NV, K, NC, C = 8192, 4, 128, 1000, 5
    B = NR * NV
    rng = np.random.default_rng(0)
    vals = jnp.asarray(rng.standard_normal((B, K, C)), jnp.float32)
    # monotone ids, like floor(s*K) along an epipolar chord
    a = jnp.asarray(np.sort(rng.integers(0, K, (B, NC)), axis=-1), jnp.int32)

    @jax.jit
    def take(vals, a):
        return jnp.take_along_axis(vals, a[..., None], axis=1)

    @jax.jit
    def msum(vals, a):
        onehot = (a[..., None] == jnp.arange(K, dtype=a.dtype))  # (B, NC, K)
        return jnp.einsum("btk,bkc->btc", onehot.astype(vals.dtype), vals)

    @jax.jit
    def msum_vpu(vals, a):
        # explicit broadcast-multiply-reduce; relies on XLA loop fusion to
        # never materialize the (B, NC, K, C) intermediate
        onehot = (a[..., None] == jnp.arange(K, dtype=a.dtype))
        return jnp.sum(onehot[..., None] * vals[:, None, :, :], axis=-2)

    @jax.jit
    def dot_tiled(vals, a):
        tiles = 8
        vals_t = vals.reshape(tiles, B // tiles, K, C)
        a_t = a.reshape(tiles, B // tiles, NC)

        def body(args):
            v, ai = args
            onehot = (ai[..., None] == jnp.arange(K, dtype=ai.dtype))
            return jnp.einsum("btk,bkc->btc", onehot.astype(jnp.bfloat16),
                              v.astype(jnp.bfloat16))
        return jax.lax.map(body, (vals_t, a_t)).reshape(B, NC, C)

    @jax.jit
    def big_gather(table, idx):
        return jnp.take(table, idx, axis=0, mode="clip")

    for name, fn, args in [
        ("remap/take_along_axis", take, (vals, a)),
        ("remap/onehot_dot", msum, (vals, a)),
        ("remap/onehot_vpu_sum", msum_vpu, (vals, a)),
        ("remap/onehot_dot_tiled_bf16", dot_tiled, (vals, a)),
    ]:
        try:
            res = benchmark(fn, *args, warmup=2, iters=5)
            report(name, res, lookups=B * NC)
        except Exception as e:  # OOM etc.
            print(json.dumps({"exp": name, "error": repr(e)[:200]}), flush=True)

    # reference points: the flat global gather at candidate and anchor counts
    H, W = 256, 320
    table = jnp.asarray(rng.standard_normal((NV * H * W, C)), jnp.float32)
    idx_full = jnp.asarray(rng.integers(0, NV * H * W, (B * NC // NV,)), jnp.int32)
    idx_anchor = jnp.asarray(rng.integers(0, NV * H * W, (B * K // NV,)), jnp.int32)
    res = benchmark(big_gather, table, idx_full, warmup=2, iters=5)
    report("gather/full_33M", res, lookups=idx_full.size)
    res = benchmark(big_gather, table, idx_anchor, warmup=2, iters=5)
    report("gather/anchor_4M", res, lookups=idx_anchor.size)


# ------------------------------------------------------------ components
def _bench_setup():
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.models import PixelNeRF

    H, W = 256, 320
    model = PixelNeRF(encoder_layers=4, encoder_norm="group",
                      image_padding=16, padding_pe=4,
                      n_blocks=5, d_hidden=512, combine_layer=3,
                      compute_dtype="bfloat16", quad_latent=True)
    cfg = RenderConfig(n_samples=40, n_depth_candidates=1000, n_gaussian=15)
    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(rng, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], xyz, xyz)
    return model, cfg, batch, variables, (H, W)


def run_components():
    from diner_tpu.data import SyntheticSphereDataset
    from diner_tpu.geometry import gen_rays
    from diner_tpu.renderer.composite import composite
    from diner_tpu.sampler import sample_depthguided
    from diner_tpu.sampler.depth_guided import surface_likelihoods, \
        sample_stratified

    model, cfg, batch, variables, (H, W) = _bench_setup()
    CHUNK = 8192

    @jax.jit
    def encode(variables, batch):
        return model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], method="encode")

    enc = encode(variables, batch)
    rays_full = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                         W, H, SyntheticSphereDataset.znear,
                         SyntheticSphereDataset.zfar).reshape(1, H * W, 8)
    rays = rays_full[:, :CHUNK]
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def sampler(rays, enc, rng):
        return sample_depthguided(rng, rays, enc, cfg)

    @jax.jit
    def likelihoods(rays, enc, rng):
        z = sample_stratified(rng, rays, cfg.n_depth_candidates)
        return surface_likelihoods(rays, z, enc, cfg.depth_diff_max)

    z = sampler(rays, enc, rng)

    @jax.jit
    def field_composite(variables, enc, rays, z):
        return composite(
            lambda p, d: model.apply(variables, enc, p, d, method="field"),
            rays, z, cfg.white_bkgd)

    res = benchmark(encode, variables, batch)
    report("comp/encode_4views", res)
    res = benchmark(likelihoods, rays, enc, rng)
    report("comp/likelihoods_8192", res)
    res = benchmark(sampler, rays, enc, rng)
    report("comp/sampler_8192", res)
    res = benchmark(field_composite, variables, enc, rays, z)
    report("comp/field_composite_8192", res)


def run_chunks():
    from diner_tpu.data import SyntheticSphereDataset
    from diner_tpu.geometry import gen_rays
    from diner_tpu.renderer import render_image

    model, cfg, batch, variables, (H, W) = _bench_setup()

    for chunk in (8192, 16384):
        @jax.jit
        def render(variables, batch, rng, chunk=chunk):
            enc = model.apply(variables, batch["src_rgbs"],
                              batch["src_depths"], batch["src_depth_stds"],
                              batch["src_extrinsics"], batch["src_intrinsics"],
                              method="encode")
            rays = gen_rays(batch["target_extrinsics"],
                            batch["target_intrinsics"], W, H,
                            SyntheticSphereDataset.znear,
                            SyntheticSphereDataset.zfar)
            return render_image(
                lambda p, d: model.apply(variables, enc, p, d, method="field"),
                jax.random.PRNGKey(0), rays, enc, cfg, chunk=chunk)

        res = benchmark(render, variables, batch, jax.random.PRNGKey(0),
                        warmup=2, iters=3)
        report(f"render/chunk_{chunk}", res,
               rays_per_sec=round(H * W / res["median_s"], 1))




def run_anchors():
    """Anchor-path cost questions: remap via take_along_axis at real shapes,
    anchor likelihoods end-to-end vs exact, coherent prior gather cost."""
    from diner_tpu.data import SyntheticSphereDataset
    from diner_tpu.geometry import gen_rays
    from diner_tpu.sampler.depth_guided import (
        surface_likelihoods, sample_stratified, gather_priors, _remap_monotone)
    from diner_tpu.geometry import transform_points, project_points

    model, cfg, batch, variables, (H, W) = _bench_setup()
    CHUNK = 8192

    @jax.jit
    def encode(variables, batch):
        return model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], method="encode")

    enc = encode(variables, batch)
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, SyntheticSphereDataset.znear,
                    SyntheticSphereDataset.zfar).reshape(1, H * W, 8)[:, :CHUNK]
    rng = jax.random.PRNGKey(1)

    # (isolated remap microbench removed: XLA pads a standalone
    # (B, NC, 5) f32 copy to (8,128) tiles -> 25x HBM blowup; the in-context
    # lik/anchor* experiments below measure the real remap cost instead)
    # coherent prior gather (the real uv pattern), exact vs anchors
    for name, kw in [("exact", {}), ("anchor64", {"n_prior_anchors": 64}),
                     ("anchor128", {"n_prior_anchors": 128}),
                     ("stride4", {"prior_stride": 4})]:
        @jax.jit
        def lik(rays, enc, rng, kw=kw):
            z = sample_stratified(rng, rays, cfg.n_depth_candidates)
            return surface_likelihoods(rays, z, enc, cfg.depth_diff_max, **kw)
        res = benchmark(lik, rays, enc, rng)
        report(f"lik/{name}", res)


def run_render2():
    """Full-frame render: anchors on/off x chunk size x quad_latent."""
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.models import PixelNeRF
    from diner_tpu.renderer import render_image

    H, W = 256, 320
    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    xyz = jnp.zeros((1, 1, 3))

    for tag, quad, anchors, chunk in [
        ("anchor128_quad_8192", True, 128, 8192),
        ("anchor128_noquad_16384", False, 128, 16384),
        ("exact_noquad_16384", False, 0, 16384),
    ]:
        model = PixelNeRF(encoder_layers=4, encoder_norm="group",
                          image_padding=16, padding_pe=4,
                          n_blocks=5, d_hidden=512, combine_layer=3,
                          compute_dtype="bfloat16", quad_latent=quad)
        cfg = RenderConfig(n_samples=40, n_depth_candidates=1000,
                           n_gaussian=15, n_prior_anchors=anchors)
        variables = model.init(rng, batch["src_rgbs"], batch["src_depths"],
                               batch["src_depth_stds"], batch["src_extrinsics"],
                               batch["src_intrinsics"], xyz, xyz)

        @jax.jit
        def render(variables, batch, rng, model=model, cfg=cfg, chunk=chunk):
            enc = model.apply(variables, batch["src_rgbs"],
                              batch["src_depths"], batch["src_depth_stds"],
                              batch["src_extrinsics"], batch["src_intrinsics"],
                              method="encode")
            rays = gen_rays(batch["target_extrinsics"],
                            batch["target_intrinsics"], W, H,
                            SyntheticSphereDataset.znear,
                            SyntheticSphereDataset.zfar)
            return render_image(
                lambda p, d: model.apply(variables, enc, p, d, method="field"),
                rng, rays, enc, cfg, chunk=chunk)

        try:
            res = benchmark(render, variables, batch, jax.random.PRNGKey(0),
                            warmup=2, iters=3)
            report(f"render/{tag}", res,
                   rays_per_sec=round(H * W / res["median_s"], 1))
        except Exception as e:
            print(json.dumps({"exp": f"render/{tag}",
                              "error": repr(e)[:300]}), flush=True)




def run_bits():
    """Bisect the likelihood and field stages; calibrate tunnel overhead."""
    from diner_tpu.data import SyntheticSphereDataset
    from diner_tpu.geometry import gen_rays, transform_points, project_points
    from diner_tpu.sampler.depth_guided import gather_priors, sample_stratified
    from diner_tpu.nn import posenc
    import math

    model, cfg, batch, variables, (H, W) = _bench_setup()
    CHUNK = 8192
    NC = cfg.n_depth_candidates

    @jax.jit
    def encode(variables, batch):
        return model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], method="encode")

    enc = encode(variables, batch)
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, SyntheticSphereDataset.znear,
                    SyntheticSphereDataset.zfar).reshape(1, H * W, 8)[:, :CHUNK]
    rng = jax.random.PRNGKey(1)

    # tunnel overhead: trivial program
    @jax.jit
    def tiny(x):
        return x + 1.0
    res = benchmark(tiny, jnp.zeros((8, 128)))
    report("bits/tunnel_overhead", res)

    def proj(rays, enc, rng):
        z = sample_stratified(rng, rays, NC)
        SB, NR, _ = rays.shape
        B = NR * NC
        xyz = rays[..., None, :3] + z[..., None] * rays[..., None, 3:6]
        xyz = xyz.reshape(SB, B, 3)
        NV = enc.poses.shape[1]
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SB, NV, B, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)
        uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)
        return uv, xyz_cam

    @jax.jit
    def proj_only(rays, enc, rng):
        uv, xyz_cam = proj(rays, enc, rng)
        return uv.sum(), xyz_cam.sum()

    @jax.jit
    def proj_gather(rays, enc, rng):
        uv, xyz_cam = proj(rays, enc, rng)
        d, s, n = gather_priors(enc, uv)
        return d.sum(), s.sum(), n.sum()

    @jax.jit
    def proj_gather_erf(rays, enc, rng):
        from jax.scipy.special import erf
        uv, xyz_cam = proj(rays, enc, rng)
        d, s, n = gather_priors(enc, uv)
        z_cam = xyz_cam[..., 2]
        safe = jnp.where(s == 0, 1.0, s) * math.sqrt(2.0)
        step = 0.002
        hi = erf((z_cam + step / 2 - d) / safe)
        lo = erf((z_cam - step / 2 - d) / safe)
        return (0.5 * jnp.abs(hi - lo)).sum()

    res = benchmark(proj_only, rays, enc, rng)
    report("bits/proj_only", res)
    res = benchmark(proj_gather, rays, enc, rng)
    report("bits/proj_gather", res)
    res = benchmark(proj_gather_erf, rays, enc, rng)
    report("bits/proj_gather_erf", res)

    # field bisection: gathers / posenc / mlp on fixed inputs
    SBn, NV = 1, 4
    Bpts = CHUNK * cfg.n_samples  # 327k points
    rg = np.random.default_rng(0)
    xyz = jnp.asarray(rg.uniform(-0.5, 0.5, (SBn, Bpts, 3)), jnp.float32)
    dirs = jnp.asarray(rg.standard_normal((SBn, Bpts, 3)), jnp.float32)

    from diner_tpu.models.pixelnerf import index_latent, index_depth

    @jax.jit
    def field_gathers(enc, xyz, dirs):
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SBn, NV, Bpts, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)
        uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)
        lat = index_latent(enc, uv)
        rd = index_depth(enc, uv)
        return lat.sum(), rd.sum()

    @jax.jit
    def field_posenc(enc, xyz, dirs):
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SBn, NV, Bpts, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)
        zf = posenc(xyz_cam, 6, 6.28)
        df = posenc(xyz_cam[..., 2:], 6, 6.28)
        return zf.sum(), df.sum()

    res = benchmark(field_gathers, enc, xyz, dirs)
    report("bits/field_gathers", res)
    res = benchmark(field_posenc, enc, xyz, dirs)
    report("bits/field_posenc", res)

    # MLP only, inputs pregathered: (SB, NV, B, d_latent + d_in)
    from diner_tpu.nn import ResnetFC, posenc_dim
    d_in = posenc_dim(3, 6) + posenc_dim(1, 6) + 3
    mlp = ResnetFC(d_in=d_in, d_out=4, n_blocks=5, d_latent=512, d_hidden=512,
                   combine_layer=3, dtype=jnp.bfloat16)
    mlp_in = jnp.asarray(rg.standard_normal((SBn, NV, Bpts, 512 + d_in)),
                         jnp.bfloat16)
    mvars = mlp.init(jax.random.PRNGKey(0), mlp_in, 1)

    @jax.jit
    def mlp_only(mvars, mlp_in):
        return mlp.apply(mvars, mlp_in, 1).sum()

    res = benchmark(mlp_only, mvars, mlp_in)
    flops = Bpts * (3 * NV + 2) * 2 * 512 * 512 * 2 + Bpts * NV * 2 * (512 + d_in + 512 * 3) * 512
    report("bits/mlp_only", res, approx_tflops=round(flops / 1e12, 2),
           tflops_per_s=round(flops / 1e12 / res["min_s"], 1))

    # MLP with fully-bf16 params (cast once)
    mvars16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), mvars)
    res = benchmark(mlp_only, mvars16, mlp_in)
    report("bits/mlp_only_bf16params", res,
           tflops_per_s=round(flops / 1e12 / res["min_s"], 1))


def run_pallas():
    """Anchor sampler with the MXU remap kernel + field gathers without quad."""
    from diner_tpu.data import SyntheticSphereDataset
    from diner_tpu.geometry import gen_rays, transform_points, project_points
    from diner_tpu.sampler.depth_guided import (
        surface_likelihoods, sample_stratified)
    from diner_tpu.models.pixelnerf import index_latent, index_depth

    model, cfg, batch, variables, (H, W) = _bench_setup()
    CHUNK = 8192

    @jax.jit
    def encode(variables, batch):
        return model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], method="encode")

    enc = encode(variables, batch)
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, SyntheticSphereDataset.znear,
                    SyntheticSphereDataset.zfar).reshape(1, H * W, 8)[:, :CHUNK]
    rng = jax.random.PRNGKey(1)

    for name, kw in [("anchor64_pallas", {"n_prior_anchors": 64}),
                     ("anchor128_pallas", {"n_prior_anchors": 128}),
                     ("exact_again", {})]:
        @jax.jit
        def lik(rays, enc, rng, kw=kw):
            z = sample_stratified(rng, rays, cfg.n_depth_candidates)
            return surface_likelihoods(rays, z, enc, cfg.depth_diff_max, **kw)
        try:
            res = benchmark(lik, rays, enc, rng)
            report(f"plk/{name}", res)
        except Exception as e:
            print(json.dumps({"exp": f"plk/{name}", "error": repr(e)[:300]}),
                  flush=True)

    # field gathers without quad packing
    enc_noquad = enc.replace(latent_quad=None)
    SBn, NV = 1, 4
    Bpts = CHUNK * cfg.n_samples
    rg = np.random.default_rng(0)
    xyz = jnp.asarray(rg.uniform(-0.5, 0.5, (SBn, Bpts, 3)), jnp.float32)

    @jax.jit
    def field_gathers_noquad(enc, xyz):
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SBn, NV, Bpts, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)
        uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)
        lat = index_latent(enc, uv)
        rd = index_depth(enc, uv)
        return lat.sum(), rd.sum()

    res = benchmark(field_gathers_noquad, enc_noquad, xyz)
    report("plk/field_gathers_noquad", res)


def run_final():
    """Clip-mode field gathers, full render with anchor64+pallas, and the
    anchor-vs-exact PSNR delta on the bench scene."""
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays, transform_points, project_points
    from diner_tpu.models import PixelNeRF
    from diner_tpu.models.pixelnerf import index_latent, index_depth
    from diner_tpu.renderer import render_image

    H, W = 256, 320
    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    xyz0 = jnp.zeros((1, 1, 3))

    model = PixelNeRF(encoder_layers=4, encoder_norm="group",
                      image_padding=16, padding_pe=4,
                      n_blocks=5, d_hidden=512, combine_layer=3,
                      compute_dtype="bfloat16", quad_latent=True)
    variables = model.init(rng, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], xyz0, xyz0)

    @jax.jit
    def encode(variables, batch):
        return model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], method="encode")

    enc = encode(variables, batch)
    SBn, NV, Bpts = 1, 4, 8192 * 40
    rg = np.random.default_rng(0)
    xyz = jnp.asarray(rg.uniform(-0.5, 0.5, (SBn, Bpts, 3)), jnp.float32)

    @jax.jit
    def field_gathers(enc, xyz):
        xyz_nv = jnp.broadcast_to(xyz[:, None], (SBn, NV, Bpts, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)
        uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)
        return index_latent(enc, uv).sum(), index_depth(enc, uv).sum()

    res = benchmark(field_gathers, enc, xyz)
    report("final/field_gathers_clip", res)

    outs = {}
    for tag, anchors in [("anchor64", 64), ("exact", 0)]:
        cfg = RenderConfig(n_samples=40, n_depth_candidates=1000,
                           n_gaussian=15, n_prior_anchors=anchors)

        @jax.jit
        def render(variables, batch, rng, cfg=cfg):
            enc = model.apply(variables, batch["src_rgbs"],
                              batch["src_depths"], batch["src_depth_stds"],
                              batch["src_extrinsics"], batch["src_intrinsics"],
                              method="encode")
            rays = gen_rays(batch["target_extrinsics"],
                            batch["target_intrinsics"], W, H,
                            SyntheticSphereDataset.znear,
                            SyntheticSphereDataset.zfar)
            return render_image(
                lambda p, d: model.apply(variables, enc, p, d, method="field"),
                rng, rays, enc, cfg, chunk=8192)

        res = benchmark(render, variables, batch, jax.random.PRNGKey(0),
                        warmup=2, iters=3)
        report(f"final/render_{tag}", res,
               rays_per_sec=round(H * W / res["median_s"], 1))
        outs[tag] = np.asarray(render(variables, batch,
                                      jax.random.PRNGKey(0))[0])

    mse = float(np.mean((outs["anchor64"] - outs["exact"]) ** 2))
    psnr = -10 * np.log10(max(mse, 1e-12))
    print(json.dumps({"exp": "final/anchor_vs_exact_psnr_dB",
                      "value": round(psnr, 2)}), flush=True)




# ------------------------------------------------------------- r3 split
def run_r3split():
    """Round-3: gather vs MLP halves at the flagship p64/A=64 config.

    Times, per 8192-ray chunk: sampler (anchor path), field_gather alone,
    field_mlp alone (pre-gathered input), gather+mlp in ONE program (does
    the in-program scheduler overlap them?), and full field+composite."""
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.models import PixelNeRF
    from diner_tpu.renderer.composite import sample_points, composite_outputs
    from diner_tpu.sampler import sample_depthguided
    from diner_tpu.utils.jitinit import jit_init

    H, W = 256, 320
    model = PixelNeRF(encoder_layers=4, encoder_norm="group",
                      image_padding=64, padding_pe=4,
                      n_blocks=5, d_hidden=512, combine_layer=3,
                      compute_dtype="bfloat16", quad_latent=True)
    cfg = RenderConfig(n_samples=40, n_depth_candidates=1000, n_gaussian=15,
                       n_prior_anchors=64, anchor_field_depth=True)
    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    xyz0 = jnp.zeros((1, 1, 3))
    variables = jit_init(model.init)(
        jax.random.PRNGKey(0), batch["src_rgbs"], batch["src_depths"],
        batch["src_depth_stds"], batch["src_extrinsics"],
        batch["src_intrinsics"], xyz0, xyz0)

    enc = jax.jit(lambda v, b: model.apply(
        v, b["src_rgbs"], b["src_depths"], b["src_depth_stds"],
        b["src_extrinsics"], b["src_intrinsics"], method="encode"))(
            variables, batch)
    CHUNK = 8192
    rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                    W, H, SyntheticSphereDataset.znear,
                    SyntheticSphereDataset.zfar
                    ).reshape(1, H * W, 8)[:, :CHUNK]
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def sampler(rays, enc, rng):
        return sample_depthguided(rng, rays, enc, cfg, return_aux=True)

    z, aux = sampler(rays, enc, rng)
    z = jax.block_until_ready(z)
    pts, dirs = jax.jit(sample_points)(rays, z)

    @jax.jit
    def gather(variables, enc, pts, aux):
        return model.apply(variables, enc, pts, aux, method="field_gather")

    gathered = jax.block_until_ready(gather(variables, enc, pts, aux))

    @jax.jit
    def mlp(variables, enc, gathered, pts, dirs):
        return model.apply(variables, enc, gathered, pts, dirs,
                           method="field_mlp")

    @jax.jit
    def gather_plus_mlp(variables, enc, pts, dirs, aux, gathered_prev):
        g = model.apply(variables, enc, pts, aux, method="field_gather")
        out = model.apply(variables, enc, gathered_prev, pts, dirs,
                          method="field_mlp")
        return g, out

    @jax.jit
    def field_comp(variables, enc, rays, z, aux):
        p, d = sample_points(rays, z)
        out = model.apply(variables, enc, p, d, aux, method="field")
        return composite_outputs(rays, z, out, cfg.white_bkgd)

    report("r3/sampler", benchmark(sampler, rays, enc, rng))
    report("r3/gather", benchmark(gather, variables, enc, pts, aux))
    report("r3/mlp", benchmark(mlp, variables, enc, gathered, pts, dirs))
    report("r3/gather_plus_mlp", benchmark(gather_plus_mlp, variables, enc,
                                           pts, dirs, aux, gathered))
    report("r3/field_composite", benchmark(field_comp, variables, enc, rays,
                                           z, aux))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "remap"
    {"remap": run_remap, "components": run_components, "chunks": run_chunks,
     "anchors": run_anchors, "render2": run_render2, "bits": run_bits,
     "pallas": run_pallas, "final": run_final, "r3split": run_r3split}[which]()
