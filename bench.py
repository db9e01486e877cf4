"""Benchmark: flagship-config throughput on one chip — certified fast render
path (built FROM the shipped config), exact reference path, turbo preview
path, and a training step. Prints ONE JSON line.

Workload mirrors the reference's DTU configuration (BASELINE.md,
configs/train_dtu.yaml in malteprinzler/diner): 4 source views,
ResNet34 pixel-aligned encoder at image_padding=64 (the flagship padding),
1000 depth candidates -> 40 samples/ray, 512-wide conditioned MLP with
view-mean, alpha compositing; one 256x320 image (81,920 rays) per timed
iteration in jitted chunks.

Primary metric: rays/s of the CERTIFIED fast preset, constructed from
configs/evaluate_diner_on_dtu_fast.yaml via cli.build (the same wiring eval
users get) — epipolar-anchor priors A=256 fetched via the paired bf16
quad-row gather + quad-packed exact bilinear latent + int8 latent rows +
bf16 compute + 32 samples/ray. On the trained padding-64
flagship-architecture checkpoint this path measures -0.016 / +0.024 dB
PSNR-vs-GT (pooled +0.004) against the exact-f32 reference-semantics render
(1000 candidates / 40 samples / 15 gaussian) on two 16-scene held-out seeds
(scripts/certify_fast_path.py --flagship-sampling,
results/certify_pairedbf16_seed{777,1313}_r5.json, PERFORMANCE.md round
5).
Also reported:
  - exact_rays_per_sec: n_prior_anchors=0, n_samples=40, f32 — bit-parity
    reference semantics, at ITS best chunk (8192);
  - exact_bf16_quad_rays_per_sec: the quality-first preset (-0.024 dB vs
    exact-f32 on 16 scenes, only bf16 compute + quad pack deviate);
  - turbo_rays_per_sec: + latent_anchors 8 — NOT certified (-1.8 dB vs GT
    on trained weights), preview-only;
  - train_steps_per_sec: DTU-recipe training step (batch 2, fg-anchored
    64x64 VGG+antibias patches = 8192 rays/step, encode + backward).
Variance: secs_per_frame_min + spread_pct report the fast path's min-of-5
alongside the median so round-over-round driver numbers are comparable
(VERDICT r4 weak #4).

vs_baseline: BASELINE.json publishes no reference numbers; the PyTorch/A100
renderer is estimated at ~5.0e4 rays/s (SURVEY.md §3.1) until
scripts/parity_dtu.sh --time-reference measures it. vs_baseline =
certified-path rays/s / 5.0e4, so the >=10x north star reads as >=10 across
8 chips.
"""

from __future__ import annotations

import dataclasses
import json

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 5.0e4
FAST_CONFIG = "configs/evaluate_diner_on_dtu_fast.yaml"
H, W = 256, 320
CHUNK = 4096
WARMUP = 2
ITERS = 5


def _certified_model_and_cfg():
    """Build the benched model/render-config FROM the shipped fast preset —
    the bench number is reproducible by any config-driven render_eval user."""
    from diner_tpu.cli.build import build_nerf, build_render_cfg
    from diner_tpu.core.config import load_config

    conf = load_config(FAST_CONFIG)
    return build_nerf(conf["nerf"]), build_render_cfg(conf["renderer"])


def bench_render(model, cfg, iters: int = ITERS, pipelined: bool = False,
                 chunk: int = CHUNK, stats: bool = False):
    """pipelined=True routes through render_flat_pipelined (field split into
    gather/MLP halves so chunk i+1's gather overlaps chunk i's MLP).
    chunk: per-path best-known chunk (VERDICT r4 weak #4: benching every
    path at one chunk made rounds incomparable — exact wants 8192, the
    anchor fast path 4096). stats=True returns (median, min, spread)."""
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.renderer import render_image
    from diner_tpu.utils.jitinit import jit_init
    from diner_tpu.utils.profiling import benchmark

    cfg = dataclasses.replace(cfg, eval_chunk_rays=chunk)

    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    xyz = jnp.zeros((1, 1, 3))
    variables = jit_init(model.init)(rng, batch["src_rgbs"],
                                     batch["src_depths"],
                                     batch["src_depth_stds"],
                                     batch["src_extrinsics"],
                                     batch["src_intrinsics"], xyz, xyz)

    @jax.jit
    def render(variables, batch, rng):
        enc = model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                          batch["src_depth_stds"], batch["src_extrinsics"],
                          batch["src_intrinsics"], method="encode")
        rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                        W, H, SyntheticSphereDataset.znear,
                        SyntheticSphereDataset.zfar)
        split = None
        if pipelined:
            split = (lambda p, aux: model.apply(variables, enc, p, aux,
                                                method="field_gather"),
                     lambda g, p, d: model.apply(variables, enc, g, p, d,
                                                 method="field_mlp"))
        return render_image(
            lambda p, d, aux=None: model.apply(variables, enc, p, d, aux,
                                               method="field"),
            rng, rays, enc, cfg, chunk=chunk, split=split)

    t = benchmark(render, variables, batch, jax.random.PRNGKey(0),
                  warmup=WARMUP, iters=iters)
    if stats:
        return t["median_s"], t["min_s"]
    return t["median_s"]


def bench_train_step(iters: int = ITERS):
    """DTU-recipe train step: fg-anchored 64x64 patches, VGG+antibias losses,
    1000 candidates -> 40 samples, encode + backward (configs/train_dtu.yaml
    optimizer block; reference diner.py:57 spatch=64)."""
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.models import PixelNeRF
    from diner_tpu.models.diner import DINER
    from diner_tpu.train.state import create_train_state
    from diner_tpu.train.step import make_train_step
    from diner_tpu.utils.profiling import benchmark

    SB = 2
    nerf = PixelNeRF(encoder_layers=4, encoder_norm="group",
                     image_padding=64, padding_pe=4,
                     n_blocks=5, d_hidden=512, combine_layer=3,
                     compute_dtype="bfloat16", remat_field=True)
    model = DINER(nerf=nerf,
                  render_cfg=RenderConfig(n_samples=40,
                                          n_depth_candidates=1000,
                                          n_gaussian=15),
                  znear=SyntheticSphereDataset.znear,
                  zfar=SyntheticSphereDataset.zfar,
                  w_vgg=0.1, w_antibias=1.0, vgg_spatch=64)
    ds = SyntheticSphereDataset(n_scenes=SB, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[i] for i in range(SB)]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    state = create_train_state(model, jax.random.PRNGKey(0), batch)
    step = make_train_step(model)

    def run(state_and_rng):
        state, rng = state_and_rng
        rng, sub = jax.random.split(rng)
        state, loss = step(state, batch, sub)
        return state, rng

    # donated state: thread it through manually, time steady-state steps
    rng = jax.random.PRNGKey(1)
    state, rng = run((state, rng))  # compile
    import time

    times = []
    for _ in range(WARMUP + iters):
        t0 = time.perf_counter()
        state, rng = run((state, rng))
        jax.block_until_ready(state.params)
        import numpy as np

        np.asarray(jax.tree_util.tree_leaves(state.params)[0].ravel()[0])
        times.append(time.perf_counter() - t0)
    return sorted(times[WARMUP:])[len(times[WARMUP:]) // 2]


def main():
    nerf, cfg = _certified_model_and_cfg()
    # per-path best-known chunk (VERDICT r4 weak #4; results/sweep_r5_knobs
    # .json): the anchor fast path peaks at 4096, the exact path at 8192 —
    # r4's one-chunk-for-all benching is why exact_rays_per_sec moved 24.8k
    # -> 18.3k between rounds (chunk 8192 -> 4096), not a code regression.
    dt_fast, min_fast = bench_render(nerf, cfg, chunk=4096, stats=True)
    dt_exact_quality = bench_render(
        nerf.clone(latent_quant=None),
        dataclasses.replace(cfg, n_prior_anchors=0, n_samples=40),
        iters=3, chunk=8192)
    dt_exact = bench_render(
        nerf.clone(compute_dtype=None, quad_latent=False, latent_quant=None),
        dataclasses.replace(cfg, n_prior_anchors=0, n_samples=40),
        iters=3, chunk=8192)
    dt_turbo = bench_render(nerf.clone(latent_anchors=8), cfg, iters=3,
                            chunk=4096)
    dt_step = bench_train_step()
    rays = H * W / dt_fast
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays / BASELINE_RAYS_PER_SEC, 3),
        # BASELINE.json publishes no reference numbers; the denominator is an
        # estimate until scripts/parity_dtu.sh --time-reference measures it
        "vs_baseline_basis": f"estimated {BASELINE_RAYS_PER_SEC:.0e} rays/s "
                             "(PyTorch A100, no published numbers; see "
                             "scripts/time_reference_render.py)",
        "path": "certified fast preset (configs/evaluate_diner_on_dtu_fast"
                ".yaml): anchors A=256 via paired bf16 quad-row gather + "
                "quad exact latent + int8 rows + bf16 + 32 samples; "
                "PSNR-vs-GT delta vs exact-f32 (1000/40/15) on the trained "
                "padding-64 checkpoint: -0.016 dB (seed 777) / +0.024 dB "
                "(seed 1313), 16 scenes each "
                "(results/certify_pairedbf16_seed*_r5.json)",
        "secs_per_frame_256x320": round(dt_fast, 4),
        "secs_per_frame_min": round(min_fast, 4),
        "spread_pct": round((dt_fast - min_fast) / dt_fast * 100, 2),
        "exact_bf16_quad_rays_per_sec": round(H * W / dt_exact_quality, 1),
        "exact_rays_per_sec": round(H * W / dt_exact, 1),
        "exact_secs_per_frame": round(dt_exact, 4),
        "exact_chunk": 8192,
        "turbo_rays_per_sec": round(H * W / dt_turbo, 1),
        "turbo_note": "latent_anchors=8 preview knob; NOT certified "
                      "(-1.8 dB vs GT on trained weights)",
        "train_steps_per_sec": round(1.0 / dt_step, 2),
        "image_padding": 64,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
