"""Component decomposition of the certified flagship render chunk.

Times each stage of the per-chunk pipeline (sampler / latent gather / MLP+
composite / full chunk) with K in-jit repetitions to amortize the tunnel's
host-fetch RTT (single-shot timings are RTT-dominated — see
scripts/microbench_gather.py). Also times the full frame to expose any
scan-iteration overhead beyond 20x the chunk time.

Usage: python scripts/decompose_flagship.py [--chunk 4096] [--reps 10]
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
    from diner_tpu.renderer import render_image
    from diner_tpu.renderer.renderer import render_rays
    from diner_tpu.renderer.composite import sample_points
    from diner_tpu.sampler import sample_depthguided
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
    chunk_rays = rays_full[:, :args.chunk]

    results = {}

    # NOTE: every traced function must take variables/enc/points as jit
    # ARGUMENTS — a closure capture turns them into HLO constants and the
    # embedded quad latent (~1.2 GB) blows the remote-compile helper's
    # request-size limit (HTTP 413).
    def loop(body):
        @jax.jit
        def run(*a):
            def f(i, acc):
                return acc + body(i, *a)
            return jax.lax.fori_loop(0, K, f, jnp.float32(0.0))
        return run

    # 1. sampler only
    def sampler_body(i, enc_, rays_):
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        z, _ = sample_depthguided(key, rays_, enc_, cfg, return_aux=True)
        return z.ravel()[0].astype(jnp.float32)

    def record(name, val):
        results[name] = val
        print(json.dumps({name: round(val, 2)}), flush=True)

    record("sampler_ms",
           timed(loop(sampler_body), enc, chunk_rays) / K * 1e3)

    # precomputed sampler outputs shared by the isolated gather/MLP stages
    key0 = jax.random.PRNGKey(0)
    z0, aux0 = jax.jit(
        lambda enc_, rays_: sample_depthguided(key0, rays_, enc_, cfg,
                                               return_aux=True))(enc,
                                                                 chunk_rays)
    points0, dirs0 = sample_points(chunk_rays, z0)
    aux0 = aux0 if cfg.anchor_field_depth else None

    def gatherfn_args(variables_, enc_, xyz, aux):
        return nerf.apply(variables_, enc_, xyz, aux, method="field_gather")

    g0 = jax.jit(gatherfn_args)(variables, enc, points0, aux0)

    # 2. latent gather only (points perturbed per iteration so the loop body
    #    cannot be hoisted)
    def gather_body(i, variables_, enc_, points_, aux_):
        p = points_ * (1.0 + i.astype(jnp.float32) * 1e-12)
        g = gatherfn_args(variables_, enc_, p, aux_)
        leaf = jax.tree_util.tree_leaves(g)[0]
        return leaf.ravel()[0].astype(jnp.float32)

    record("gather_only_ms",
           timed(loop(gather_body), variables, enc, points0, aux0) / K * 1e3)

    # 3. MLP+blend only (gathered rows precomputed)
    def mlp_body(i, variables_, enc_, g_, points_, dirs_):
        p = points_ * (1.0 + i.astype(jnp.float32) * 1e-12)
        out = nerf.apply(variables_, enc_, g_, p, dirs_, method="field_mlp")
        leaf = jax.tree_util.tree_leaves(out)[0]
        return leaf.ravel()[0].astype(jnp.float32)

    record("mlp_composite_ms",
           timed(loop(mlp_body), variables, enc, g0, points0, dirs0)
           / K * 1e3)

    # 4. full chunk (sampler + gather + mlp + composite)
    def full_body(i, variables_, enc_, rays_):
        key = jax.random.fold_in(jax.random.PRNGKey(0), i)
        ffn = lambda p, d, aux=None: nerf.apply(variables_, enc_, p, d, aux,
                                                method="field")
        out = render_rays(ffn, key, rays_, enc_, cfg)
        return out["rgb"].ravel()[0].astype(jnp.float32)

    try:
        record("full_chunk_ms",
               timed(loop(full_body), variables, enc, chunk_rays) / K * 1e3)
    except Exception as exc:  # remote-compile size limit — frame/20 covers it
        print(json.dumps({"full_chunk_error": str(exc)[:160]}), flush=True)
        results["full_chunk_ms"] = float("nan")

    # 5. full frame through the real entry (includes the lax.map scan)
    @jax.jit
    def frame(variables_, enc_, rng):
        ffn = lambda p, d, aux=None: nerf.apply(variables_, enc_, p, d, aux,
                                                method="field")
        return render_image(ffn, rng, rays_full.reshape(1, H, W, 8),
                            enc_, cfg, chunk=args.chunk)

    def frame_runner(rng):
        out = frame(variables, enc, rng)
        np.asarray(out[0].ravel()[0])
        return out

    ts = []
    frame_runner(key0)
    for _ in range(5):
        t0 = time.perf_counter()
        frame_runner(key0)
        ts.append(time.perf_counter() - t0)
    results["frame_ms"] = float(np.median(ts[1:])) * 1e3

    n_chunks = -(-H * W // args.chunk)
    results["n_chunks"] = n_chunks
    results["chunks_x_full_ms"] = results["full_chunk_ms"] * n_chunks
    results["chunk"] = args.chunk
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in results.items()}, indent=1), flush=True)


if __name__ == "__main__":
    main()
