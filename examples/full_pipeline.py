"""End-to-end pipeline on a fabricated FaceScape-layout dataset.

Demonstrates the full product loop a real-data user follows, on one
synthetic sphere subject (CPU-runnable, ~5 min; faster on TPU):

  1. fabricate a FaceScape-layout subject on disk (rgba + uint16 depth
     priors + cameras.json — the exact reference disk contract),
  2. (optional, --mvs-write) run the TransMVSNet-equivalent depth-prior
     writer over a copy of the subject (`mvs write --dataset facescape`),
  3. train DINER on it through the real config/CLI path,
  4. re-score the in-loop eval folder with the eval suite.

Run: python examples/full_pipeline.py [--steps 300] [--mvs-write]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def make_subject(root: Path, H=48, W=48, n_views=12):
    """One subject/expression on the FaceScape disk contract
    (src/data/facescape.py file layout; frontal direction is -y)."""
    import imageio.v2 as imageio

    from diner_tpu.data.codecs import write_png16
    from diner_tpu.data.synthetic import SyntheticSphereDataset

    ds = SyntheticSphereDataset(n_scenes=1, n_views=1, H=H, W=W)
    centers, radii, colors = ds._scene(0)
    centers = centers * 0.3  # keep the spheres inside the facescape frustum

    def lookat(eye):
        eye = np.asarray(eye, np.float64)
        z = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 0.0, -1.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        ext = np.eye(4)
        ext[:3, :3] = np.stack([x, y, z])
        ext[:3, 3] = -ext[:3, :3] @ eye
        return ext.astype(np.float32)

    scan = root / "001" / "01"
    scan.mkdir(parents=True, exist_ok=True)
    K = np.array([[1.1 * W, 0, W / 2], [0, 1.1 * W, H / 2], [0, 0, 1]],
                 np.float32)
    cam_dict = {}
    az = np.linspace(-np.pi / 3, np.pi / 3, n_views)
    for i, a in enumerate(az):
        el = 0.25 * np.sin(2.1 * a)
        eye = 1.6 * np.array([np.sin(a) * np.cos(el),
                              -np.cos(a) * np.cos(el), np.sin(el)])
        ext = lookat(eye)
        rgb, alpha, depth = ds._render_view(ext, K, centers, radii, colors)
        rgba = np.concatenate([np.where(alpha > 0, rgb, 1.0), alpha], -1)
        vdir = scan / f"view_{i:05d}"
        vdir.mkdir(exist_ok=True)
        imageio.imwrite(vdir / "rgba_colorcalib.png",
                        (np.clip(rgba, 0, 1) * 255).astype(np.uint8))
        write_png16(vdir / "depth_TransMVSNet.png",
                    np.clip(depth[..., 0] / 1e-4, 0, 65535).astype(np.uint16))
        write_png16(vdir / "depth_TransMVSNet_conf.png",
                    np.full((H, W), 0.9 / 1e-4, np.uint16))
        cam_dict[str(i)] = {"extrinsics": ext[:3].tolist(),
                            "intrinsics": K.tolist()}
    (scan / "3dlmks.npy").write_bytes(b"")
    (scan / "cameras.json").write_text(json.dumps(cam_dict))
    return root


CONFIG = """\
logger: {{kwargs: {{save_dir: {out}}}}}
data:
  train:
    dataset:
      module: FacescapeDataset
      # empty val_subjects -> subject 001 lands in the train split
      kwargs: {{root: {root}, meta_dir: {meta}, val_subjects: [],
               range_hor: 45, range_vert: 30, slide_range: 0}}
    dataloader: {{kwargs: {{batch_size: 1, shuffle: true, num_workers: 2}}}}
  val:
    dataset:
      module: FacescapeDataset
      kwargs: {{root: {root}, meta_dir: {meta}, val_subjects: ["001"],
               range_hor: 45, range_vert: 30, slide_range: 0}}
    dataloader: {{kwargs: {{batch_size: 1, shuffle: false}}}}
nerf:
  kwargs:
    encoder_conf: {{kwargs: {{num_layers: 2, image_padding: 8, padding_pe: 2,
                             norm: group}}}}
    poscode_conf: {{kwargs: {{num_freqs: 6, freq_factor: 6.28}}}}
    mlp_fine_conf: {{kwargs: {{n_blocks: 3, d_hidden: 128, combine_layer: 2}}}}
renderer:
  kwargs: {{n_samples: 16, n_depth_candidates: 128, n_gaussian: 6,
           white_bkgd: true, n_prior_anchors: 32}}
optimizer:
  kwargs: {{lr: 1e-4, ray_batch_size: 128, vgg_spatch: 8, w_antibias: 1.0,
           n_samples_score_eval: 4}}
trainer:
  kwargs: {{max_steps: {steps}, val_check_interval: {val_every}}}
checkpointing: {{kwargs: {{every_n_train_steps: {steps}}}}}
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--mvs-write", action="store_true",
                    help="also run the MVS depth-prior writer on a copy")
    args = ap.parse_args()

    work = Path(args.workdir or tempfile.mkdtemp(prefix="diner_pipeline_"))
    root = work / "FACESCAPE"
    meta = work / "meta"
    meta.mkdir(parents=True, exist_ok=True)

    print(f"[1/4] fabricating FaceScape-layout subject under {root}")
    # 64 = /32-aligned (the MVS cascade's stage strides)
    make_subject(root, 64, 64, 12)

    if args.mvs_write:
        print("[2/4] MVS depth-prior writing on a copy (untrained cascade)")
        mvs_root = work / "FACESCAPE_MVS"
        shutil.copytree(root, mvs_root)
        from diner_tpu.cli.mvs import main as mvs_main

        kw = json.dumps({"meta_dir": str(work / "meta_mvs"),
                         "val_subjects": ["001"], "slide_range": 0})
        (work / "meta_mvs").mkdir(exist_ok=True)
        mvs_main(["write", "--dataset", "facescape", "--datapath",
                  str(mvs_root), "--listfile", "unused", "--dataset-kwargs",
                  kw, "--ndepths", "8,8,8", "--numdepth", "16",
                  "--cr_base_chs", "4,4,4", "--base_channels", "4"])
        print("      wrote", len(list(mvs_root.rglob("*_TransMVSNet.png"))),
              "prior maps")
    else:
        print("[2/4] (skipping MVS write; pass --mvs-write to include it)")

    print(f"[3/4] training DINER for {args.steps} steps")
    cfg_path = work / "config.yaml"
    cfg_path.write_text(CONFIG.format(root=root, meta=meta,
                                      out=work / "runs", steps=args.steps,
                                      val_every=max(1, args.steps // 2)))
    from diner_tpu.cli.train import main as train_main

    train_main([str(cfg_path), "--run-dir", str(work / "runs" / "demo")])

    print("[4/4] re-scoring the eval folder")
    evals = sorted((work / "runs" / "demo").glob("eval_*"))
    assert evals, "training produced no eval folder"
    from diner_tpu.cli.eval_folder import main as eval_main

    eval_main(["score", str(evals[-1])])
    print(f"done — artifacts in {work}")


if __name__ == "__main__":
    main()
