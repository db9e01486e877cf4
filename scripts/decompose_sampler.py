"""Sub-stage decomposition of the depth-guided sampler at flagship shape.

The sampler is 16.7 ms of the 70 ms flagship chunk (decompose_flagship.py).
Times each internal stage with K in-jit repetitions: stratified candidates,
surface likelihoods (anchor gather + Pallas likelihood kernel), top-k
shortlist (approx vs exact), gaussian refit, uniform refill.

Usage: python scripts/decompose_sampler.py [--chunk 4096] [--reps 10]
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
    args = ap.parse_args(argv)
    K = args.reps

    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.sampler import sample_depthguided
    from diner_tpu.sampler.depth_guided import (fill_uniform,
                                                sample_stratified,
                                                surface_likelihoods)
    from diner_tpu.utils import weighted_mean_and_std
    from diner_tpu.utils.jitinit import jit_init

    nerf, cfg = bench._certified_model_and_cfg()
    H, W = bench.H, bench.W

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

    results = {}

    def loop(body):
        @jax.jit
        def run(*a):
            def f(i, acc):
                return acc + body(i, *a)
            return jax.lax.fori_loop(0, K, f, jnp.float32(0.0))
        return run

    def record(name, val):
        results[name] = val
        print(json.dumps({name: round(val, 2)}), flush=True)

    # precomputed stage inputs
    key0 = jax.random.PRNGKey(0)
    z_cand0 = jax.jit(lambda r: sample_stratified(key0, r,
                                                  cfg.n_depth_candidates))(rays)
    p0, opaque0 = jax.jit(
        lambda r, z, e: surface_likelihoods(
            r, z, e, cfg.depth_diff_max, prior_stride=cfg.prior_stride,
            n_prior_anchors=cfg.n_prior_anchors)[:2])(rays, z_cand0, enc)

    # 1. stratified candidates
    def strat_body(i, rays_):
        key = jax.random.fold_in(key0, i)
        z = sample_stratified(key, rays_, cfg.n_depth_candidates)
        return z.ravel()[0]

    record("stratified_ms", timed(loop(strat_body), rays) / K * 1e3)

    # 2. surface likelihoods (anchor gather + Pallas kernel + gates)
    def lik_body(i, rays_, z_, enc_):
        z = z_ * (1.0 + i.astype(z_.dtype) * 1e-12)
        p, opq = surface_likelihoods(rays_, z, enc_, cfg.depth_diff_max,
                                     prior_stride=cfg.prior_stride,
                                     n_prior_anchors=cfg.n_prior_anchors)[:2]
        return p.ravel()[0] + opq.ravel()[0]

    record("likelihoods_ms",
           timed(loop(lik_body), rays, z_cand0, enc) / K * 1e3)

    # 3. top-k shortlist: approx vs exact
    def topk_body(approx):
        def body(i, p_):
            p = p_ * (1.0 + i.astype(p_.dtype) * 1e-12)
            if approx:
                tp, ti = jax.lax.approx_max_k(p, cfg.n_samples)
            else:
                tp, ti = jax.lax.top_k(p, cfg.n_samples)
            return tp.ravel()[0] + ti.ravel()[0].astype(jnp.float32)
        return body

    record("approx_topk_ms", timed(loop(topk_body(True)), p0) / K * 1e3)
    record("exact_topk_ms", timed(loop(topk_body(False)), p0) / K * 1e3)

    # 4. gaussian refit (weighted mean/std over the 1000 candidates)
    def refit_body(i, z_, opq_):
        z = z_ * (1.0 + i.astype(z_.dtype) * 1e-12)
        mean, std = weighted_mean_and_std(z, opq_, axis=-1, keepdims=True)
        return mean.ravel()[0] + std.ravel()[0]

    record("gauss_refit_ms",
           timed(loop(refit_body), z_cand0, opaque0) / K * 1e3)

    # 5. uniform refill (sort over n_samples)
    z_sel0 = jax.jit(lambda p, z: jnp.take_along_axis(
        z, jax.lax.approx_max_k(p, cfg.n_samples)[1], axis=-1))(p0, z_cand0)

    def fill_body(i, z_, rays_):
        key = jax.random.fold_in(key0, i)
        z = z_ * (1.0 + i.astype(z_.dtype) * 1e-12)
        return fill_uniform(key, z, rays_).ravel()[0]

    record("fill_uniform_ms", timed(loop(fill_body), z_sel0, rays) / K * 1e3)

    # 6. whole sampler
    def full_body(i, rays_, enc_):
        key = jax.random.fold_in(key0, i)
        z, _ = sample_depthguided(key, rays_, enc_, cfg, return_aux=True)
        return z.ravel()[0]

    record("sampler_total_ms", timed(loop(full_body), rays, enc) / K * 1e3)

    print(json.dumps({k: round(v, 2) for k, v in results.items()}, indent=1))
    Path("results/decompose_sampler_r4.json").write_text(json.dumps(results))


if __name__ == "__main__":
    main()
