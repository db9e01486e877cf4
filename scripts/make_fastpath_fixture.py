"""Train the small synthetic DINER used by the fast-path GT-delta regression
test and save its params as a compact fp16 .npz fixture.

tests/test_fastpath_regression.py gates the certified fast render path's
PSNR-vs-GT delta (<= 0.1 dB vs the exact-f32 render, BASELINE.md north-star
gate) on TRAINED weights — approximation error only shows once the field has
sharp structure (at random weights every path trivially agrees; that was
VERDICT r3's core complaint). This script reproduces the committed fixture:

  python scripts/make_fastpath_fixture.py \
      --out tests/fixtures/fastpath_tiny.npz [--steps 3000]

Model: ResNet34 2-stage encoder (latent 128), 128-wide MLP — ~2M params,
~4 MB at fp16. Training: the plateau recipe (96 procedural scenes, 64x64,
fg-anchored 16^2 patches + antibias) for --steps steps.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

MODEL_KW = dict(encoder_layers=2, encoder_norm="group", image_padding=16,
                padding_pe=4, n_blocks=5, d_hidden=128, combine_layer=3)
RENDER_KW = dict(n_samples=24, n_depth_candidates=256, n_gaussian=8,
                 white_bkgd=False)
DATA_KW = dict(n_views=4, H=64, W=64)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n-scenes", type=int, default=96)
    ap.add_argument("--out", default="tests/fixtures/fastpath_tiny.npz")
    args = ap.parse_args(argv)

    import yaml

    conf = {
        "data": {
            "train": {"dataset": {"module": "SyntheticSphereDataset",
                                  "kwargs": {**DATA_KW,
                                             "n_scenes": args.n_scenes}},
                      "dataloader": {"kwargs": {"batch_size": 2,
                                                "num_workers": 4,
                                                "shuffle": True}}},
            "val": {"dataset": {"module": "SyntheticSphereDataset",
                                "kwargs": {**DATA_KW, "n_scenes": 4,
                                           "seed": 777}},
                    "dataloader": {"kwargs": {"batch_size": 2,
                                              "shuffle": False}}},
        },
        "nerf": {"kwargs": {
            "encoder_conf": {"kwargs": {
                "num_layers": MODEL_KW["encoder_layers"],
                "norm": MODEL_KW["encoder_norm"],
                "image_padding": MODEL_KW["image_padding"],
                "padding_pe": MODEL_KW["padding_pe"]}},
            "poscode_conf": {"kwargs": {"num_freqs": 6, "freq_factor": 6.28,
                                        "include_input": True}},
            "mlp_fine_conf": {"kwargs": {
                "n_blocks": MODEL_KW["n_blocks"],
                "d_hidden": MODEL_KW["d_hidden"],
                "combine_layer": MODEL_KW["combine_layer"]}}}},
        "renderer": {"kwargs": dict(RENDER_KW)},
        "optimizer": {"kwargs": {"lr": 1e-4, "ray_batch_size": 256,
                                 "vgg_spatch": 16, "w_antibias": 1.0,
                                 "antibias_downsampling": 2,
                                 "n_samples_score_eval": 4}},
        "trainer": {"kwargs": {"max_steps": args.steps,
                               "val_check_interval": args.steps}},
        "checkpointing": {"kwargs": {"every_n_train_steps": args.steps}},
        "logger": {"kwargs": {"save_dir": None}},
    }

    work = Path(tempfile.mkdtemp(prefix="fastpath_fixture_"))
    conf["logger"]["kwargs"]["save_dir"] = str(work / "run")
    cfg_path = work / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(conf))

    from diner_tpu.cli.train import main as train_main

    train_main([str(cfg_path), "--run-dir", str(work / "run")])

    import jax

    from diner_tpu.cli.build import build_dataset, build_diner
    from diner_tpu.core.config import load_config
    from diner_tpu.data.contract import collate, to_device_batch
    from diner_tpu.train.loop import restore_checkpoint
    from diner_tpu.train.state import create_train_state

    conf = load_config(cfg_path)
    ds = build_dataset(conf["data"]["val"], stage="val")
    model = build_diner(conf, znear=ds.znear, zfar=ds.zfar)
    example = to_device_batch(collate([ds[0]]))
    state = create_train_state(model, jax.random.PRNGKey(0), example)
    state, step = restore_checkpoint(work / "run" / "ckpts", state)
    print(f"fixture trained to step {step}")

    flat = {"/".join(map(str, [getattr(p, "key", p) for p in path])):
            np.asarray(v).astype(np.float16)
            for path, v in jax.tree_util.tree_flatten_with_path(
                state.params)[0]}
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    meta = {"model_kw": MODEL_KW, "render_kw": RENDER_KW,
            "data_kw": DATA_KW, "step": int(step),
            "znear": float(ds.znear), "zfar": float(ds.zfar)}
    np.savez_compressed(out, __meta__=json.dumps(meta), **flat)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB, "
          f"{len(flat)} arrays)")


if __name__ == "__main__":
    main()
