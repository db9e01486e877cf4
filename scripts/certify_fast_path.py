"""Certify the fast render path against GROUND TRUTH at flagship scale.

VERDICT r3 missing #1: every headline above 10x rides on approximations
(epipolar-anchor priors + anchored latent fetch) whose effect on the actual
GT metric had never been measured. This script takes a TRAINED run (the
384-scene plateau recipe), renders its held-out seed-777 scenes at 256x320
(the reference's DTU frame size, src/data/dtu.py + downsample 0.5) through
each render path, and reports PSNR/SSIM vs GT plus measured rays/s per path:

  exact_f32   n_prior_anchors=0, f32 compute — bit-parity reference semantics
  exact_bf16  n_prior_anchors=0, bf16 convs/MLP/latent (params stay f32)
  anchor      A=64 prior anchors, exact per-sample latent, bf16
  fast16      A=64 + latent_anchors=16, bf16
  fast8       A=64 + latent_anchors=8, bf16  (the bench.py headline)

The certification gate (BASELINE.md north star): a path is CERTIFIED when
its PSNR-vs-GT is within 0.1 dB of exact_f32 AND its rays/s puts 8 chips at
>= 10x the 50k rays/s reference estimate (>= 62.5k rays/s/chip).

Usage (real TPU chip):
  python scripts/certify_fast_path.py --run-dir outputs/plateau/scenes384_12k \
      [--H 256 --W 320] [--n-scenes 4] [--iters 3] [--out certify.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from diner_tpu.utils.profiling import setup_compilation_cache

setup_compilation_cache()

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _flagship_paths():
    """Paths for --flagship-sampling: quality deltas at the reference's DTU
    sampling scale (1000 candidates / 40 samples / 15 gaussian) on the
    trained checkpoint. Throughput certification for these knobs comes from
    the flagship-shape (padding-64) sweep, scripts/sweep_flagship_knobs.py —
    NOT from the timings this script prints (the trained plateau model is a
    padding-16 architecture, lighter than flagship)."""
    bfq = {"compute_dtype": "bfloat16", "latent_anchors": 0,
           "quad_latent": True}
    return [
        ("exact_f32", {"compute_dtype": None, "latent_anchors": 0},
         {"n_prior_anchors": 0}),
        ("exact_bf16_quad", dict(bfq), {"n_prior_anchors": 0}),
        ("anchor64_quad", dict(bfq), {"n_prior_anchors": 64}),
        ("anchor96_quad", dict(bfq), {"n_prior_anchors": 96}),
        ("anchor128_quad", dict(bfq), {"n_prior_anchors": 128}),
        ("anchor96_quad_ns32", dict(bfq),
         {"n_prior_anchors": 96, "n_samples": 32}),
        # n_samples sweep on BOTH the exact and anchor paths (VERDICT r4
        # weak #5: anchor96_quad_ns32 measured +0.26 dB ABOVE exact-40 —
        # determine whether fewer samples genuinely beat the reference's 40
        # (nerf_renderer.py:23-37 default) on trained fields, or the
        # synthetic certify scenes rank paths poorly)
        ("exact_f32_ns24", {"compute_dtype": None, "latent_anchors": 0},
         {"n_prior_anchors": 0, "n_samples": 24}),
        ("exact_f32_ns32", {"compute_dtype": None, "latent_anchors": 0},
         {"n_prior_anchors": 0, "n_samples": 32}),
        ("exact_f32_ns48", {"compute_dtype": None, "latent_anchors": 0},
         {"n_prior_anchors": 0, "n_samples": 48}),
        ("exact_f32_ns64", {"compute_dtype": None, "latent_anchors": 0},
         {"n_prior_anchors": 0, "n_samples": 64}),
        ("anchor96_quad_ns24", dict(bfq),
         {"n_prior_anchors": 96, "n_samples": 24}),
        ("anchor96_quad_ns48", dict(bfq),
         {"n_prior_anchors": 96, "n_samples": 48}),
        ("anchor96_quad_ns64", dict(bfq),
         {"n_prior_anchors": 96, "n_samples": 64}),
        ("anchor96_quad_nc512", dict(bfq),
         {"n_prior_anchors": 96, "n_depth_candidates": 512}),
        ("anchor96_quad_nc512_ns32", dict(bfq),
         {"n_prior_anchors": 96, "n_depth_candidates": 512, "n_samples": 32}),
        ("anchor96_quad_int8", dict(bfq, latent_quant="int8"),
         {"n_prior_anchors": 96}),
        # error-source isolation (r5): noafd = exact per-sample field depth
        # (anchors only in the sampler); higher A = finer chord
        # discretization
        ("anchor96_quad_noafd", dict(bfq),
         {"n_prior_anchors": 96, "anchor_field_depth": False}),
        ("anchor128_quad_noafd", dict(bfq),
         {"n_prior_anchors": 128, "anchor_field_depth": False}),
        ("anchor160_quad", dict(bfq), {"n_prior_anchors": 160}),
        ("anchor192_quad", dict(bfq), {"n_prior_anchors": 192}),
        ("anchor256_quad", dict(bfq), {"n_prior_anchors": 256}),
        ("anchor128_quad_ns32", dict(bfq),
         {"n_prior_anchors": 128, "n_samples": 32}),
        ("anchor160_quad_ns32", dict(bfq),
         {"n_prior_anchors": 160, "n_samples": 32}),
        ("anchor160_quad_ns32_int8", dict(bfq, latent_quant="int8"),
         {"n_prior_anchors": 160, "n_samples": 32}),
        ("anchor192_quad_ns32", dict(bfq),
         {"n_prior_anchors": 192, "n_samples": 32}),
        ("anchor192_quad_ns32_int8", dict(bfq, latent_quant="int8"),
         {"n_prior_anchors": 192, "n_samples": 32}),
        ("anchor192_quad_ns32_int8_paired", dict(bfq, latent_quant="int8"),
         {"n_prior_anchors": 192, "n_samples": 32,
          "paired_prior_gather": True}),
        ("anchor256_quad_ns32_int8_paired", dict(bfq, latent_quant="int8"),
         {"n_prior_anchors": 256, "n_samples": 32,
          "paired_prior_gather": True}),
        ("anchor256_quad_ns24_int8_paired", dict(bfq, latent_quant="int8"),
         {"n_prior_anchors": 256, "n_samples": 24,
          "paired_prior_gather": True}),
        ("exact_quad_int8", dict(bfq, latent_quant="int8"),
         {"n_prior_anchors": 0}),
        ("fast8", dict(bfq, latent_anchors=8), {"n_prior_anchors": 96}),
        # strided quad fetch: skipped samples are EXACT when they share a
        # texel cell with a fetched neighbor; chord-lerp only on crossings
        ("anchor96_quad_ls2", dict(bfq, latent_sample_stride=2),
         {"n_prior_anchors": 96}),
        ("anchor128_quad_ls2", dict(bfq, latent_sample_stride=2),
         {"n_prior_anchors": 128}),
        ("anchor96_quad_ls4", dict(bfq, latent_sample_stride=4),
         {"n_prior_anchors": 96}),
        # run-length-dedup latent fetch: EXACT bilinear semantics while each
        # (ray, view)'s samples touch <= K distinct texel cells
        # (index_latent_unique; probe_cell_runs.py sizes K)
        ("anchor96_quad_uc8", dict(bfq, latent_unique_cells=8),
         {"n_prior_anchors": 96}),
        ("anchor96_quad_uc12", dict(bfq, latent_unique_cells=12),
         {"n_prior_anchors": 96}),
        ("anchor96_quad_uc16", dict(bfq, latent_unique_cells=16),
         {"n_prior_anchors": 96}),
        ("anchor96_quad_uc12_int8",
         dict(bfq, latent_unique_cells=12, latent_quant="int8"),
         {"n_prior_anchors": 96}),
    ]


def _render_paths():
    """(name, model-overrides, render-cfg-overrides) per certified path."""
    bf = {"compute_dtype": "bfloat16", "latent_anchors": 0}
    return [
        ("exact_f32", {"compute_dtype": None, "latent_anchors": 0},
         {"n_prior_anchors": 0}),
        ("exact_bf16", dict(bf), {"n_prior_anchors": 0}),
        ("exact_bf16_quad", dict(bf, quad_latent=True),
         {"n_prior_anchors": 0}),
        ("anchor128_quad", dict(bf, quad_latent=True),
         {"n_prior_anchors": 128}),
        ("anchor", dict(bf), {"n_prior_anchors": 64}),
        ("anchor96", dict(bf), {"n_prior_anchors": 96}),
        ("anchor96_quad", dict(bf, quad_latent=True), {"n_prior_anchors": 96}),
        ("anchor96_c8k", dict(bf),
         {"n_prior_anchors": 96, "eval_chunk_rays": 8192}),
        ("anchor96_quad_c8k", dict(bf, quad_latent=True),
         {"n_prior_anchors": 96, "eval_chunk_rays": 8192}),
        ("anchor128", dict(bf), {"n_prior_anchors": 128}),
        ("anchor_noafd", dict(bf),
         {"n_prior_anchors": 64, "anchor_field_depth": False}),
        ("anchor128_noafd", dict(bf),
         {"n_prior_anchors": 128, "anchor_field_depth": False}),
        ("fast32", {"compute_dtype": "bfloat16", "latent_anchors": 32},
         {"n_prior_anchors": 64}),
        ("fast16", {"compute_dtype": "bfloat16", "latent_anchors": 16},
         {"n_prior_anchors": 64}),
        ("fast8", {"compute_dtype": "bfloat16", "latent_anchors": 8},
         {"n_prior_anchors": 64}),
    ]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--W", type=int, default=320)
    ap.add_argument("--n-scenes", type=int, default=4)
    ap.add_argument("--seed", type=int, default=777,
                    help="held-out scene seed (the plateau val split)")
    ap.add_argument("--iters", type=int, default=3,
                    help="timed renders per path (median reported)")
    ap.add_argument("--chunk", type=int, default=4096)
    ap.add_argument("--paths", default=None,
                    help="comma list subset of exact_f32,exact_bf16,anchor,"
                         "fast16,fast8")
    ap.add_argument("--flagship-sampling", action="store_true",
                    help="override the run's renderer to the reference's "
                         "flagship sampling (1000 candidates / 40 samples / "
                         "15 gaussian) and sweep the _flagship_paths() rows; "
                         "quality deltas only — flagship THROUGHPUT comes "
                         "from scripts/sweep_flagship_knobs.py")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from diner_tpu.cli.build import build_diner
    from diner_tpu.core.config import load_config
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.eval.metrics import psnr, ssim
    from diner_tpu.train.loop import restore_checkpoint
    from diner_tpu.train.state import create_train_state

    run = Path(args.run_dir)
    conf = load_config(run / "config.yaml")
    ds_kw = dict(conf["data"]["val"]["dataset"]["kwargs"])
    ds_kw.update(H=args.H, W=args.W, n_scenes=args.n_scenes, seed=args.seed)
    ds = SyntheticSphereDataset(**{k: v for k, v in ds_kw.items()
                                   if k in ("n_scenes", "n_views", "H", "W",
                                            "depth_std", "seed")})

    if args.flagship_sampling:
        conf.setdefault("renderer", {}).setdefault("kwargs", {}).update(
            n_depth_candidates=1000, n_samples=40, n_gaussian=15)
    base = build_diner(conf, znear=ds.znear, zfar=ds.zfar)
    batches = [to_device_batch(collate([ds[i]])) for i in range(len(ds))]
    batches = [{k: jnp.asarray(v) for k, v in b.items()
                if not isinstance(v, list)} for b in batches]

    state = create_train_state(base, jax.random.PRNGKey(0), batches[0])
    state, step = restore_checkpoint(run / "ckpts", state)
    print(f"restored step {step} from {run / 'ckpts'}")
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats

    wanted = args.paths.split(",") if args.paths else None
    results = {}
    paths = (_flagship_paths() if args.flagship_sampling
             else _render_paths())
    for name, nerf_over, cfg_over in paths:
        if wanted and name not in wanted:
            continue
        cfg_kw = {"eval_chunk_rays": args.chunk, **cfg_over}
        model = base.clone(nerf=base.nerf.clone(**nerf_over),
                           render_cfg=dataclasses.replace(base.render_cfg,
                                                          **cfg_kw))

        render = jax.jit(lambda v, a, r, m=model: m.apply(
            v, a, r, method="render_batch"))

        psnrs, ssims = [], []
        for i, b in enumerate(batches):
            rgb, _ = render(variables, b, jax.random.PRNGKey(i))
            rgb = np.clip(np.asarray(rgb), 0.0, 1.0)
            gt = np.asarray(b["target_rgb"])
            psnrs.append(float(psnr(rgb, gt)))
            ssims.append(float(np.mean([ssim(rgb[j], gt[j])
                                        for j in range(rgb.shape[0])])))

        # steady-state timing on scene 0 (same protocol as bench.py)
        times = []
        for it in range(args.iters + 1):
            t0 = time.perf_counter()
            rgb, _ = render(variables, batches[0], jax.random.PRNGKey(100 + it))
            np.asarray(rgb[0, 0, 0])  # device+host sync
            times.append(time.perf_counter() - t0)
        dt = sorted(times[1:])[len(times[1:]) // 2]

        results[name] = {
            "psnr_gt": round(float(np.mean(psnrs)), 3),
            "ssim_gt": round(float(np.mean(ssims)), 4),
            "secs_per_frame": round(dt, 4),
            "rays_per_sec": round(args.H * args.W / dt, 1),
        }
        print(name, json.dumps(results[name]))

    if "exact_f32" in results:
        ref_psnr = results["exact_f32"]["psnr_gt"]
        for name, r in results.items():
            r["psnr_delta_vs_exact_f32"] = round(r["psnr_gt"] - ref_psnr, 3)
            if args.flagship_sampling:
                # speed half of the gate comes from the flagship-shape sweep
                # (sweep_flagship_knobs.py), not this lighter trained model
                r["within_gate_0p1db"] = bool(
                    abs(r["psnr_delta_vs_exact_f32"]) <= 0.1)
            else:
                r["certified_10x"] = bool(
                    abs(r["psnr_delta_vs_exact_f32"]) <= 0.1
                    and r["rays_per_sec"] >= 62500.0)

    out = {
        "run_dir": str(run), "step": int(step),
        "H": args.H, "W": args.W, "n_scenes": args.n_scenes,
        "seed": args.seed, "chunk": args.chunk,
        "device": str(jax.devices()[0]),
        "paths": results,
    }
    if args.flagship_sampling:
        pad = (conf.get("nerf", {}).get("kwargs", {})
               .get("encoder_conf", {}).get("kwargs", {})
               .get("image_padding", "?"))
        out["mode"] = ("flagship-sampling: renderer overridden to 1000 "
                       "candidates / 40 samples / 15 gaussian; PSNR/SSIM "
                       "deltas are the deliverable. secs_per_frame / "
                       "rays_per_sec are measured on the trained run's own "
                       f"architecture (image_padding {pad}; flagship "
                       "preset = 64).")
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line)


if __name__ == "__main__":
    main()
