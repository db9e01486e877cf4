"""Benchmark: depth-guided render throughput (rays/sec/chip) on the flagship model.

Workload mirrors the reference's DTU render path (BASELINE.md): 4 source views,
ResNet34 pixel-aligned encoder, 1000 depth candidates -> 40 samples/ray,
512-wide conditioned MLP with view-mean, alpha compositing. One 256x320 image
worth of rays (81,920) per timed iteration, rendered in jitted chunks.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: BASELINE.json records no published numbers (`published: {}`);
the reference's PyTorch/A100 renderer is estimated at ~5.0e4 rays/sec
(ray_batch_size-chunked 1000-candidate scoring + 2.6M MLP evals/step,
SURVEY.md §3.1 hot loops; README "full val eval might take quite long").
vs_baseline = rays_per_sec / 5.0e4 — i.e. the >=10x target reads as >=10.
"""

from __future__ import annotations

import json

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp

BASELINE_RAYS_PER_SEC = 5.0e4
H, W = 256, 320
CHUNK = 8192
WARMUP = 2
ITERS = 5


def main():
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.models import PixelNeRF
    from diner_tpu.renderer import render_image

    model = PixelNeRF(encoder_layers=4, encoder_norm="group",
                      image_padding=16, padding_pe=4,
                      n_blocks=5, d_hidden=512, combine_layer=3,
                      compute_dtype="bfloat16", quad_latent=True)
    # epipolar-anchor prior fetch + anchor field depth: both stay within the
    # reference's own +-0.5 px nearest-pixel quantization class whenever the
    # epipolar chord is shorter than 2*A px (typical DTU chords are tens of
    # px). Rendered output agrees with the exact path at 38.4 dB PSNR (A=64)
    # / 39.9 dB (A=128) on the synthetic bench scene. A=64: 60k rays/s;
    # A=128: 53.5k. Set n_prior_anchors=0 for exact reference semantics.
    cfg = RenderConfig(n_samples=40, n_depth_candidates=1000, n_gaussian=15,
                       n_prior_anchors=64)

    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    rng = jax.random.PRNGKey(0)
    xyz = jnp.zeros((1, 1, 3))
    from diner_tpu.utils.jitinit import jit_init
    variables = jit_init(model.init)(rng, batch["src_rgbs"], batch["src_depths"],
                           batch["src_depth_stds"], batch["src_extrinsics"],
                           batch["src_intrinsics"], xyz, xyz)

    @jax.jit
    def render(variables, batch, rng):
        enc = model.apply(variables, batch["src_rgbs"], batch["src_depths"],
                          batch["src_depth_stds"], batch["src_extrinsics"],
                          batch["src_intrinsics"], method="encode")
        rays = gen_rays(batch["target_extrinsics"], batch["target_intrinsics"],
                        W, H, SyntheticSphereDataset.znear,
                        SyntheticSphereDataset.zfar)
        return render_image(
            lambda p, d, aux=None: model.apply(variables, enc, p, d, aux,
                                               method="field"),
            rng, rays, enc, cfg, chunk=CHUNK)

    from diner_tpu.utils.profiling import benchmark

    timings = benchmark(render, variables, batch, jax.random.PRNGKey(0),
                        warmup=WARMUP, iters=ITERS)
    dt = timings["median_s"]
    rays_per_sec = H * W / dt
    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
        "secs_per_frame_256x320": round(dt, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
