"""Scene-cached (serving / bulk-eval) render throughput at flagship shape.

The DTU eval workload renders MANY validation views per scan from the SAME
4 source views (reference: python_scripts/create_prediction_folder.py loops
target views with fixed sources, re-running the encoder every view inside
DINER.forward). RenderServer encodes once per scene and renders each target
from the cached SceneEncoding — bit-identical output to re-encoding, so the
speedup carries zero quality cost; the GT deltas measured by
certify_fast_path.py apply unchanged.

Reports per-frame seconds and rays/s for (a) the certified fast preset and
(b) exact-class paths, at the flagship padding-64 architecture, 256x320.

Usage: python scripts/bench_serve_cached.py [--out results/...json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def time_cached(model, cfg, H, W, iters=5):
    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.serve import RenderServer

    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    b = {k: jnp.asarray(v) for k, v in to_device_batch(collate([ds[0]])).items()
         if not isinstance(v, list)}
    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), b["src_rgbs"],
                           b["src_depths"], b["src_depth_stds"],
                           b["src_extrinsics"], b["src_intrinsics"], xyz, xyz)
    srv = RenderServer(model, variables, cfg, ds.znear, ds.zfar,
                       buckets=((H, W),), chunk=cfg.eval_chunk_rays)
    srv.load_scene("s", b["src_rgbs"], b["src_depths"], b["src_depth_stds"],
                   b["src_extrinsics"], b["src_intrinsics"])

    times = []
    for it in range(iters + 2):
        t0 = time.perf_counter()
        rgb, _ = srv.render("s", b["target_extrinsics"],
                            b["target_intrinsics"], H, W, seed=it)
        np.asarray(rgb[0, 0, 0])
        times.append(time.perf_counter() - t0)
    dt = sorted(times[2:])[len(times[2:]) // 2]
    return dt


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--out", default="results/bench_serve_cached_r4.json")
    args = ap.parse_args(argv)

    H, W = bench.H, bench.W
    nerf, cfg = bench._certified_model_and_cfg()

    rows = [
        # row 1 IS the shipped preset, whatever the YAML currently says
        # (r5: A=192 + quad + int8 + bf16 + ns32)
        ("shipped_preset", nerf, cfg),
        ("shipped_anchors128", nerf,
         dataclasses.replace(cfg, n_prior_anchors=128)),
        ("exact_bf16_quad_ns40", nerf.clone(latent_quant=None),
         dataclasses.replace(cfg, n_prior_anchors=0, n_samples=40)),
    ]
    out = {}
    for name, model, c in rows:
        dt = time_cached(model, c, H, W, iters=args.iters)
        out[name] = {"secs_per_frame_cached": round(dt, 4),
                     "rays_per_sec": round(H * W / dt, 1),
                     "x8_vs_50k": round(H * W / dt / 50e3 * 8, 2)}
        print(name, json.dumps(out[name]), flush=True)

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    Path(args.out).write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
