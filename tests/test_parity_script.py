"""Dry-run of scripts/parity_dtu.sh on the fake-Lightning fixture: the
real-artifact parity runner (render ported ckpt -> score -> table) executes
end to end against a tiny DTU-layout tree.

A small-MLP checkpoint (d_hidden=32) keeps the 256x320 CPU render tractable;
the ResNet34 trunk and the whole CLI flow (port, forced BN/relu, deterministic
subset, folder scoring, gate table) are exercised for real.
Reference flow: python_scripts/create_prediction_folder.py:30-49 +
evaluate_prediction_folder.py in malteprinzler/diner.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_data import _make_fake_dtu  # noqa: E402
from test_model_port import _fake_lightning_sd  # noqa: E402

REPO = Path(__file__).resolve().parents[1]


def test_parity_dtu_script_dryrun(tmp_path):
    root = tmp_path / "dtu"
    root.mkdir()
    split_dir = _make_fake_dtu(root, all_cams=True)

    sd = _fake_lightning_sd(d_hidden=32)
    ckpt = tmp_path / "diner_dtu.ckpt"
    torch.save({"state_dict": {k: torch.from_numpy(np.asarray(v))
                               for k, v in sd.items()}}, ckpt)

    # small-model config: flagship encoder surgery (padding 64 + border PE),
    # tiny MLP matching the ckpt, light renderer for CPU
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(f"""
data:
  train:
    dataset: {{module: DTUDataset, kwargs: {{root: {root}, depth_fname: TransMVSNet}}}}
    dataloader: {{kwargs: {{batch_size: 1}}}}
  val:
    dataset: {{module: DTUDataset, kwargs: {{root: {root}, depth_fname: TransMVSNet}}}}
    dataloader: {{kwargs: {{batch_size: 1}}}}
nerf:
  kwargs:
    encoder_conf: {{kwargs: {{image_padding: 64, padding_pe: 4, norm: batch}}}}
    poscode_conf: {{kwargs: {{num_freqs: 6, freq_factor: 6.28, include_input: true}}}}
    mlp_fine_conf: {{kwargs: {{n_blocks: 5, d_hidden: 32, combine_layer: 3}}}}
renderer:
  kwargs: {{n_samples: 4, n_depth_candidates: 32, n_gaussian: 2}}
optimizer:
  kwargs: {{ray_batch_size: 64, lr: 1.0e-4}}
""")

    # known reference means -> exercises the gate table path too
    ref_scores = tmp_path / "ref.json"
    ref_scores.write_text(json.dumps({"psnr": 10.0, "ssim": 0.5}))

    # a measured-timing JSON (as written by scripts/time_reference_render.py
    # in the reference environment) -> exercises the vs_baseline retirement row
    ref_timing = tmp_path / "reference_timing.json"
    ref_timing.write_text(json.dumps({
        "reference_rays_per_sec": 48211.0, "secs_per_frame": 1.7,
        "frames": 8, "total_rays": 655360, "device": "cuda",
        "torch": "1.11.0", "ckpt": "x", "config": "y"}))

    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)  # drop the axon site dir -> clean CPU
    env["JAX_PLATFORMS"] = "cpu"
    out = tmp_path / "out"
    res = subprocess.run(
        ["bash", str(REPO / "scripts/parity_dtu.sh"),
         "--ckpt", str(ckpt), "--data", str(root),
         "--out", str(out), "--n", "1", "--config", str(cfg),
         "--dataset-kwargs", json.dumps({"split_dir": str(split_dir)}),
         "--ref-scores", str(ref_scores), "--ref-timing", str(ref_timing)],
        env=env, capture_output=True, text=True, timeout=1500)
    assert "DTU parity table" in res.stdout, res.stdout + res.stderr
    assert "PARITY GATE" in res.stdout
    assert "reference renderer (measured): 48211.0 rays/s" in res.stdout
    scores = json.loads((out / "port" / "average_scores.json").read_text())
    assert {"psnr", "ssim", "l1", "l2"} <= set(scores)
    assert np.isfinite(list(scores.values())).all()
    # random ckpt vs fake reference numbers: gate outcome is whatever it is,
    # but the script must exit through the gate (0 or 1), not crash
    assert res.returncode in (0, 1), res.stderr
