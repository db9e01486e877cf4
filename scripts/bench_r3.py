"""Round-3 perf exploration: flagship padding-64 config, anchor vs exact,
chunk sweep. Prints one JSON line per case."""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp

H, W = 256, 320


def build(padding: int, anchors: int, chunk: int, d_hidden: int = 512,
          pipelined: bool = False, latent_anchors: int = 0):
    from diner_tpu.core.types import RenderConfig
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import gen_rays
    from diner_tpu.models import PixelNeRF
    from diner_tpu.renderer import render_image
    from diner_tpu.utils.jitinit import jit_init

    model = PixelNeRF(encoder_layers=4, encoder_norm="group",
                      image_padding=padding, padding_pe=4,
                      n_blocks=5, d_hidden=d_hidden, combine_layer=3,
                      compute_dtype="bfloat16", quad_latent=True,
                      latent_anchors=latent_anchors)
    cfg = RenderConfig(n_samples=40, n_depth_candidates=1000, n_gaussian=15,
                       n_prior_anchors=anchors)
    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(0)
    xyz = jnp.zeros((1, 1, 3))
    variables = jit_init(model.init)(rng, batch["src_rgbs"], batch["src_depths"],
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

    return render, variables, batch


def run_case(name, padding, anchors, chunk, warmup=2, iters=3,
             pipelined=False, latent_anchors=0):
    from diner_tpu.utils.profiling import benchmark

    render, variables, batch = build(padding, anchors, chunk,
                                     pipelined=pipelined,
                                     latent_anchors=latent_anchors)
    t = benchmark(render, variables, batch, jax.random.PRNGKey(0),
                  warmup=warmup, iters=iters)
    dt = t["median_s"]
    print(json.dumps({"case": name, "padding": padding, "anchors": anchors,
                      "chunk": chunk, "secs_per_frame": round(dt, 4),
                      "rays_per_sec": round(H * W / dt, 1)}), flush=True)


def run_psnr(la_list):
    """PSNR of latent-anchored renders vs the latent-exact render (same
    prior-anchor config, isolating the latent approximation)."""
    import numpy as np

    outs = {}
    for la in [0] + la_list:
        render, variables, batch = build(64, 64, 4096, latent_anchors=la)
        outs[la] = np.asarray(render(variables, batch,
                                     jax.random.PRNGKey(0))[0])
    for la in la_list:
        mse = float(np.mean((outs[la] - outs[0]) ** 2))
        print(json.dumps({"case": f"psnr_latent_anchors_{la}_vs_exact",
                          "psnr_dB": round(-10 * np.log10(max(mse, 1e-12)),
                                           2)}), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="p16a64c8192,p64a64c8192,p64a0c8192")
    ap.add_argument("--psnr", default=None,
                    help="comma list of latent_anchors values to score vs "
                         "exact, e.g. 8,16,32")
    args = ap.parse_args()
    if args.psnr:
        run_psnr([int(x) for x in args.psnr.split(",")])
        raise SystemExit(0)
    for c in args.cases.split(","):
        pipelined = c.endswith("P")
        spec = c[:-1] if pipelined else c
        la = 0
        if "l" in spec:
            spec, la_s = spec.rsplit("l", 1)
            la = int(la_s)
        p, rest = spec[1:].split("a")
        a, ch = rest.split("c")
        run_case(c, int(p), int(a), int(ch), pipelined=pipelined,
                 latent_anchors=la)
