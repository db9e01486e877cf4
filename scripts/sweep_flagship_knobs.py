"""Sweep render knobs at the FLAGSHIP shape (padding-64 model, 256x320,
1000 candidates, 40 samples) for rays/s on one chip.

Round-4 repair: the first certification pass measured rays/s on the plateau
model (padding 16, 256 candidates, 24 samples) and mislabelled them as
flagship throughput. This sweep measures the real flagship-shape throughput
per knob combination (throughput is weight-independent; quality deltas are
measured separately on the trained checkpoint by certify_fast_path.py
--flagship-sampling).

Usage: python scripts/sweep_flagship_knobs.py [--out results/...json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (repo-root bench.py: flagship workload defs)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--out", default="results/sweep_flagship_knobs_r4.json")
    ap.add_argument("--only", default=None, help="comma list of row names")
    args = ap.parse_args(argv)

    nerf, cfg = bench._certified_model_and_cfg()  # A=96 + quad + bf16, c4096

    rows = [
        # (name, model, cfg-overrides)
        ("a96_quad_c4096", nerf, {}),
        ("a96_quad_c8192", nerf, {"eval_chunk_rays": 8192}),
        ("a96_quad_c16384", nerf, {"eval_chunk_rays": 16384}),
        ("a64_quad_c8192", nerf,
         {"n_prior_anchors": 64, "eval_chunk_rays": 8192}),
        ("a96_quad_ns32_c8192", nerf,
         {"n_samples": 32, "eval_chunk_rays": 8192}),
        ("a96_quad_nc512_c8192", nerf,
         {"n_depth_candidates": 512, "eval_chunk_rays": 8192}),
        ("a96_quad_nc512_ns32_c8192", nerf,
         {"n_depth_candidates": 512, "n_samples": 32,
          "eval_chunk_rays": 8192}),
        ("exact_quad_c8192", nerf,
         {"n_prior_anchors": 0, "eval_chunk_rays": 8192}),
        ("a96_quad_int8_c4096", nerf.clone(latent_quant="int8"), {}),
        ("a128_quad_c4096", nerf, {"n_prior_anchors": 128}),
        ("exact_quad_int8_c8192", nerf.clone(latent_quant="int8"),
         {"n_prior_anchors": 0, "eval_chunk_rays": 8192}),
        # strided quad fetch: half the gather rows; skipped samples exact
        # whenever they share a texel cell with a fetched neighbor
        ("a96_quad_ls2_c4096", nerf.clone(latent_sample_stride=2), {}),
        ("a96_quad_ls2_c8192", nerf.clone(latent_sample_stride=2),
         {"eval_chunk_rays": 8192}),
        ("a128_quad_ls2_c4096",
         nerf.clone(latent_sample_stride=2), {"n_prior_anchors": 128}),
        ("a96_quad_ls4_c4096", nerf.clone(latent_sample_stride=4), {}),
        # software-pipelined: chunk i+1's sampler+gather overlaps chunk i's
        # MLP (decompose_flagship: stages currently run serially —
        # 16+25+22 ms of a 69 ms chunk)
        ("a96_quad_pipe_c4096", nerf, {"pipelined": True}),
        ("a96_quad_pipe_c8192", nerf,
         {"pipelined": True, "eval_chunk_rays": 8192}),
        ("a96_quad_pipe_c2048", nerf,
         {"pipelined": True, "eval_chunk_rays": 2048}),
        ("a96_quad_int8_pipe_c4096", nerf.clone(latent_quant="int8"),
         {"pipelined": True}),
        # run-length-dedup latent fetch: gather only each ray's K distinct
        # texel cells (exact while runs fit; probe_cell_runs.py sizes K)
        ("a96_quad_uc8_c4096", nerf.clone(latent_unique_cells=8), {}),
        ("a96_quad_uc12_c4096", nerf.clone(latent_unique_cells=12), {}),
        ("a96_quad_uc16_c4096", nerf.clone(latent_unique_cells=16), {}),
        ("a96_quad_uc12_c8192", nerf.clone(latent_unique_cells=12),
         {"eval_chunk_rays": 8192}),
        ("a96_quad_uc12_int8_c4096",
         nerf.clone(latent_unique_cells=12, latent_quant="int8"), {}),
        ("a96_quad_uc12_pipe_c4096", nerf.clone(latent_unique_cells=12),
         {"pipelined": True}),
    ]

    wanted = args.only.split(",") if args.only else None
    out = {}
    for name, model, over in rows:
        if wanted and name not in wanted:
            continue
        over = dict(over)
        # bench_render pins eval_chunk_rays to bench.CHUNK — set it per row
        bench.CHUNK = over.pop("eval_chunk_rays", 4096)
        pipelined = over.pop("pipelined", False)
        c = dataclasses.replace(cfg, **over)
        dt = bench.bench_render(model, c, iters=args.iters,
                                pipelined=pipelined)
        out[name] = {"secs_per_frame": round(dt, 4),
                     "rays_per_sec": round(bench.H * bench.W / dt, 1),
                     "x8_vs_50k": round(bench.H * bench.W / dt / 50e3 * 8, 2)}
        print(name, json.dumps(out[name]), flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
