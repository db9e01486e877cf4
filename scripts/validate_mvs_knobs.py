"""Validate the MVS throughput knobs (bf16 compute, window DCN) on TRAINED
weights — not random init.

VERDICT r3 weak #3: the bf16 WTA-flip and window-DCN caveats were argued
from random weights ("trained peaked volumes are far stabler",
"offsets stay well under 1 px") but never measured on a trained cascade.
This script:

  1. builds a small view-consistent MVS scene (textured plane sampled via
     plane-induced homographies, BlendedMVS on-disk layout) and trains the
     cascade through the real CLI (cli/mvs.py train) until the DCN offsets
     move off zero;
  2. audits the window-DCN exactness domain on the trained weights
     (window_offset_stats: max |k + offset| vs the margin);
  3. measures gather-vs-window depth disagreement at the trained offsets;
  4. measures the f32-vs-bf16 WTA flip rate on the trained (peaked) prob
     volumes.

Prints one JSON line; numbers go to PERFORMANCE.md.

Usage: python scripts/validate_mvs_knobs.py [--steps 300] [--out knobs.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# honor JAX_PLATFORMS even where a site hook pre-forces another platform
# (this sandbox's axon plugin); lets the validation run on CPU while the
# chip is busy
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np


def make_plane_fixture(root: Path, n_views=4, H=64, W=64, depth=2.0,
                       dmin=1.0, dmax=3.0, seed=0):
    """BlendedMVS-layout scene of a fronto-parallel textured plane at
    `depth`, viewed from `n_views` laterally shifted cameras. Images are
    sampled from ONE shared smooth texture through each view's projection,
    so cross-view matching (what the cascade trains on) is well-posed."""
    from PIL import Image

    from diner_tpu.data.codecs import write_pfm

    rng = np.random.RandomState(seed)
    scan = root / "sceneA"
    (scan / "blended_images").mkdir(parents=True)
    (scan / "cams").mkdir()
    (scan / "rendered_depth_maps").mkdir()

    # smooth random texture on the plane, evaluated analytically
    n_waves = 24
    freqs = rng.uniform(0.5, 6.0, (n_waves, 2))
    phases = rng.uniform(0, 2 * np.pi, n_waves)
    amps = rng.uniform(0.2, 1.0, n_waves)
    colors = rng.rand(n_waves, 3)

    def texture(x, y):  # world-plane coords -> rgb in [0, 1]
        img = np.zeros((*x.shape, 3), np.float32)
        for f, p, a, c in zip(freqs, phases, amps, colors):
            w = a * np.sin(f[0] * x * 6 + f[1] * y * 6 + p)
            img += w[..., None] * c
        img -= img.min()
        return img / max(img.max(), 1e-6)

    fx = fy = 80.0
    K = np.array([[fx, 0, W / 2], [0, fy, H / 2], [0, 0, 1]], np.float32)
    for v in range(n_views):
        ext = np.eye(4, dtype=np.float32)
        ext[0, 3] = 0.12 * (v - n_views / 2 + 0.5)  # lateral baseline
        # pixel grid -> ray -> plane intersection (world z = depth)
        xs, ys = np.meshgrid(np.arange(0.5, W), np.arange(0.5, H))
        xc = (xs - K[0, 2]) / fx
        yc = (ys - K[1, 2]) / fy
        # cam-space point at plane: z_cam = depth (fronto-parallel, no rot)
        xw = xc * depth - ext[0, 3]
        yw = yc * depth - ext[1, 3]
        img = texture(xw, yw)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            scan / "blended_images" / f"{v:08d}.jpg")
        K_full = K.copy()
        K_full[:2] *= 4.0  # bld cams carry full-res intrinsics
        lines = ["extrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in ext]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in K_full]
        interval = (dmax - dmin) / 16
        lines += ["", f"{dmin} {interval} 16 {dmax}"]
        (scan / "cams" / f"{v:08d}_cam.txt").write_text("\n".join(lines) + "\n")
        write_pfm(scan / "rendered_depth_maps" / f"{v:08d}.pfm",
                  np.full((H, W), depth, np.float32))
    pair = [str(n_views)]
    for v in range(n_views):
        srcs = [s for s in range(n_views) if s != v]
        pair += [str(v), f"{len(srcs)} " + " ".join(f"{s} 10.0" for s in srcs)]
    (scan / "cams" / "pair.txt").write_text("\n".join(pair) + "\n")
    listfile = root / "list.txt"
    listfile.write_text("sceneA\n")
    return listfile


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--ndepths", default="16,8,8")
    ap.add_argument("--numdepth", type=int, default=64)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    work = Path(args.workdir) if args.workdir else \
        Path(tempfile.mkdtemp(prefix="mvs_knobs_"))
    data = work / "bld"
    data.mkdir(parents=True, exist_ok=True)
    listfile = make_plane_fixture(data)

    import jax
    import jax.numpy as jnp

    from diner_tpu.cli.mvs import main as mvs_main
    from diner_tpu.cli.mvs import _restore_params_stats
    from diner_tpu.mvs import TransMVSNet, window_offset_stats
    from diner_tpu.mvs.datasets import BlendedMVSDataset

    logdir = work / "train"
    arch = ["--ndepths", args.ndepths, "--depth_inter_r", "4,2,1",
            "--numdepth", str(args.numdepth),
            "--cr_base_chs", "8,8,8", "--base_channels", "8"]
    mvs_main(["train", "--dataset", "bld", "--datapath", str(data),
              "--listfile", str(listfile), "--logdir", str(logdir),
              "--batch-size", "1", "--max-steps", str(args.steps),
              "--save-every", str(args.steps), "--log-every", "50",
              "--lr", str(args.lr)] + arch)

    variables = _restore_params_stats(logdir / "ckpts", None)
    kw = dict(ndepths=tuple(int(x) for x in args.ndepths.split(",")),
              depth_intervals_ratio=(4, 2, 1), cr_base_chs=(8, 8, 8),
              base_channels=8)
    ds = BlendedMVSDataset(data, listfile, ndepths=args.numdepth)
    s = ds[0]
    imgs = jnp.asarray(s["imgs"])[None]
    projs = {k: jnp.asarray(v)[None] for k, v in s["proj_matrices"].items()}
    dvals = jnp.asarray(s["depth_values"])[None]
    interval = float(dvals[0, 1] - dvals[0, 0])  # stage-3 hypothesis step

    nets = {name: TransMVSNet(compute_dtype=cd, dcn_impl=di, **kw)
            for name, (cd, di) in {
                "f32_gather": ("float32", "gather"),
                "f32_window": ("float32", "window"),
                "bf16_gather": ("bfloat16", "gather"),
                "bf16_window": ("bfloat16", "window")}.items()}

    outs = {}
    for name, net in nets.items():
        outs[name] = jax.jit(lambda v, i, p, d, n=net: n.apply(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            i, p, d))(variables, imgs, projs, dvals)

    def depth_stats(a, b):
        d = np.abs(np.asarray(a["depth"]) - np.asarray(b["depth"]))
        return {"max_abs_depth_diff": round(float(d.max()), 6),
                "flip_rate_gt_1_interval":
                    round(float((d > interval).mean()), 5),
                "mean_abs_depth_diff": round(float(d.mean()), 6)}

    max_disp, per_layer = window_offset_stats(
        nets["f32_window"], variables, imgs, projs, dvals)
    ref = outs["f32_gather"]
    peak = float(np.asarray(ref["photometric_confidence"]).mean())

    result = {
        "steps": args.steps,
        "stage3_interval": round(interval, 5),
        "trained_conf_mean": round(peak, 4),
        "window_max_abs_k_plus_offset": round(max_disp, 4),
        "window_margin": 2.0,
        "window_in_exactness_domain": bool(max_disp < 2.0 - 1e-3),
        "window_per_layer_max": {k: round(v, 4)
                                 for k, v in sorted(per_layer.items())},
        "window_vs_gather_f32": depth_stats(outs["f32_window"], ref),
        "bf16_vs_f32_gather": depth_stats(outs["bf16_gather"], ref),
        "bf16_window_vs_f32_gather": depth_stats(outs["bf16_window"], ref),
        "device": str(jax.devices()[0]),
        "workdir": str(work),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        Path(args.out).write_text(line)


if __name__ == "__main__":
    main()
