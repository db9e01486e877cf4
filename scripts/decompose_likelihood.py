"""Micro-decomposition of the anchor-likelihood stage at flagship shape.

decompose_sampler.py found likelihood scoring (12.8 ms of the 15.6 ms
sampler at chunk 4096) dominates. This splits that stage into its three
physical costs:
  1. chord arithmetic — closed-form rational-linear uv(z): anchor ids a,
     cam-space depths z_cam (pure VPU, no memory traffic beyond rays)
  2. anchor prior gather — A nearest-pixel lookups per (view, ray)
     (gather-unit issue-rate bound: G*A row lookups)
  3. Pallas likelihood kernel — one-hot MXU remap + gated erf mass
     (MXU + VPU, VMEM-resident)

Usage: python scripts/decompose_likelihood.py [--chunk 4096] [--reps 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (sets up compilation cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(looped, *args, iters=4, warmup=2):
    out = looped(*args)
    np.asarray(out)
    times = []
    for _ in range(warmup + iters):
        t0 = time.perf_counter()
        out = looped(*args)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times[warmup:]))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--out", default="results/decompose_likelihood_r4.json")
    args = ap.parse_args(argv)
    K = args.reps

    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays, transform_points
    from diner_tpu.sampler.depth_guided import (_gather_anchor_priors,
                                                sample_stratified,
                                                surface_likelihoods)
    from diner_tpu.sampler.pallas_likelihood import likelihood_from_anchors
    from diner_tpu.utils.jitinit import jit_init

    nerf, cfg = bench._certified_model_and_cfg()
    H, W = bench.H, bench.W
    A = cfg.n_prior_anchors
    NC = cfg.n_depth_candidates

    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}

    variables = jit_init(nerf.init)(
        jax.random.PRNGKey(0), batch["src_rgbs"], batch["src_depths"],
        batch["src_depth_stds"], batch["src_extrinsics"],
        batch["src_intrinsics"], jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)))

    @jax.jit
    def encode(variables, batch):
        return nerf.apply(variables, batch["src_rgbs"], batch["src_depths"],
                          batch["src_depth_stds"], batch["src_extrinsics"],
                          batch["src_intrinsics"], method="encode")

    enc = encode(variables, batch)
    rays_full = gen_rays(batch["target_extrinsics"],
                         batch["target_intrinsics"], W, H,
                         ds.znear, ds.zfar).reshape(1, H * W, 8)
    rays = rays_full[:, :args.chunk]
    SB, NR, _ = rays.shape
    NV = enc.poses.shape[1]

    key0 = jax.random.PRNGKey(0)
    z_cand0 = jax.jit(lambda r: sample_stratified(key0, r, NC))(rays)

    results = {"chunk": args.chunk, "A": A, "NC": NC, "NV": NV}

    def loop(body):
        @jax.jit
        def run(*a):
            def f(i, acc):
                return acc + body(i, *a)
            return jax.lax.fori_loop(0, K, f, jnp.float32(0.0))
        return run

    def record(name, val):
        results[name] = val
        print(json.dumps({name: round(val, 3)}), flush=True)

    # ---- shared chord precompute (mirrors surface_likelihoods' anchor path)
    def chord_state(rays_, z_, enc_):
        dirs = jnp.broadcast_to(rays_[:, None, :, 3:6], (SB, NV, NR, 3))
        dirs_cam = jnp.einsum("svij,svrj->svri", enc_.poses[..., :3, :3], dirs)
        o_nv = jnp.broadcast_to(rays_[:, None, :, :3], (SB, NV, NR, 3))
        o_cam = transform_points(enc_.poses, o_nv)
        wh = jnp.asarray(enc_.image_shape, rays_.dtype)
        f2 = (enc_.focal * 2.0 / wh)[:, :, None]
        cterm = (enc_.c * 2.0 / wh - 1.0)[:, :, None]
        U0 = o_cam[..., :2] * f2 + o_cam[..., 2:3] * cterm
        U1 = dirs_cam[..., :2] * f2 + dirs_cam[..., 2:3] * cterm
        w0, w1 = o_cam[..., 2], dirs_cam[..., 2]
        z0, zL = z_[:, None, :, 0], z_[:, None, :, -1]
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
        z_nv = z_[:, None]
        z_cam = w0[..., None] + z_nv * w1[..., None]
        z_cam_safe = jnp.where(jnp.abs(z_cam) > 1e-9, z_cam, 1.0)
        t = (P0[..., None] + z_nv * P1[..., None]) \
            / (z_cam_safe * jnp.where(dd == 0, 1.0, dd)[..., None])
        s_par = jnp.where(dd[..., None] > 1e-12, t, 0.5)
        a = jnp.clip((jnp.clip(s_par, 0.0, 1.0) * A).astype(jnp.int32),
                     0, A - 1)
        return dirs_cam, uv0, duv, a, z_cam

    # 1. chord arithmetic (ids + z_cam), no gathers / kernel
    def chord_body(i, rays_, z_, enc_):
        z = z_ * (1.0 + i.astype(z_.dtype) * 1e-12)
        _, uv0, duv, a, z_cam = chord_state(rays_, z, enc_)
        return (uv0.ravel()[0] + duv.ravel()[0]
                + a.ravel()[0].astype(jnp.float32) + z_cam.ravel()[0])

    record("chord_arith_ms",
           timed(loop(chord_body), rays, z_cand0, enc) / K * 1e3)

    # 2. anchor gather alone (fixed chord state as input)
    dirs_cam0, uv0_0, duv0, a0, z_cam0 = jax.jit(chord_state)(
        rays, z_cand0, enc)

    def gather_body(i, uv0_, duv_, enc_):
        u = uv0_ * (1.0 + i.astype(uv0_.dtype) * 1e-12)
        ad, astd, anrm = _gather_anchor_priors(enc_, u, duv_, A)
        return ad.ravel()[0] + astd.ravel()[0] + anrm.ravel()[0]

    record("anchor_gather_ms",
           timed(loop(gather_body), uv0_0, duv0, enc) / K * 1e3)

    # 3. Pallas kernel alone (fixed anchor values + ids as input)
    ad0, astd0, anrm0 = jax.jit(
        lambda u, d, e: _gather_anchor_priors(e, u, d, A))(uv0_0, duv0, enc)
    acos0 = jnp.sum(dirs_cam0[:, :, :, None, :] * anrm0, axis=-1)
    vals0 = jnp.stack([ad0, astd0, acos0], axis=3)  # (SB, NV, NR, 3, A)
    G = SB * NV * NR
    half0 = jnp.broadcast_to(
        ((rays[..., 7] - rays[..., 6]) / (2 * NC))[:, None], (SB, NV, NR))

    def kernel_body(i, a_, vals_, z_cam_, half_):
        v = vals_ * (1.0 + i.astype(vals_.dtype) * 1e-12)
        p = likelihood_from_anchors(
            a_.reshape(G, NC), v.reshape(G, 3, A).astype(jnp.float32),
            z_cam_.reshape(G, NC), half_.reshape(G, 1), cfg.depth_diff_max)
        return p.ravel()[0]

    record("pallas_kernel_ms",
           timed(loop(kernel_body), a0, vals0, z_cam0, half0) / K * 1e3)

    # 4. full stage (matches decompose_sampler's likelihoods_ms)
    def full_body(i, rays_, z_, enc_):
        z = z_ * (1.0 + i.astype(z_.dtype) * 1e-12)
        p, opq = surface_likelihoods(rays_, z, enc_, cfg.depth_diff_max,
                                     prior_stride=cfg.prior_stride,
                                     n_prior_anchors=cfg.n_prior_anchors)[:2]
        return p.ravel()[0] + opq.ravel()[0]

    record("full_stage_ms",
           timed(loop(full_body), rays, z_cand0, enc) / K * 1e3)

    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in results.items()}, indent=1))
    Path(args.out).write_text(json.dumps(results))


if __name__ == "__main__":
    main()
