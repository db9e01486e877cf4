"""Prediction-folder writer: render a dataset subset to scored PNG files.

Behavioral reference: src/models/diner.py:99-136 (create_prediction_folder) in
malteprinzler/diner: per sample write <stem>-pred.png / -gt.png / -ref.png
(h-concat of sources) / -depth.png (viridis colormap); deterministic subsets
via Random(0).sample (create_prediction_folder.py:36).
"""

from __future__ import annotations

import os
from pathlib import Path
from random import Random
from typing import Optional

import numpy as np

from diner_tpu.data.contract import collate, to_device_batch
from diner_tpu.eval.suite import SUFFIXES
from diner_tpu.image_ops import colormap


def _save(path, img01):
    import imageio.v2 as imageio

    imageio.imwrite(path, (np.clip(np.asarray(img01), 0, 1) * 255
                           ).astype(np.uint8))


def deterministic_subset(n_total: int, n_samples: Optional[int], seed: int = 0):
    idcs = list(range(n_total))
    if n_samples and 0 < n_samples < n_total:
        idcs = Random(seed).sample(idcs, n_samples)
    return idcs


def create_prediction_folder(render_fn, dataset, outdir, n_samples=None,
                             batch_size: int = 1, rng_seed: int = 0):
    """render_fn(batch, seed) -> (rgb (SB, H, W, 3), depth (SB, H, W)).

    Writes the 4-file-per-sample folder consumed by eval.suite.evaluate_folder.
    """
    outdir = Path(outdir)
    os.makedirs(outdir, exist_ok=True)

    idcs = deterministic_subset(len(dataset), n_samples)
    for start in range(0, len(idcs), batch_size):
        chunk = idcs[start:start + batch_size]
        samples = [dataset[i] for i in chunk]
        batch = collate(samples)
        names = batch.get("sample_name", [f"sample_{i:06d}" for i in chunk])
        arrays = to_device_batch(batch)
        rgb, depth = render_fn(arrays, rng_seed + start)
        rgb, depth = np.asarray(rgb), np.asarray(depth)
        depth_rgb = colormap(depth[..., None])
        for i, name in enumerate(names):
            _save(outdir / f"{name}{SUFFIXES['pred']}", rgb[i])
            _save(outdir / f"{name}{SUFFIXES['depth']}", depth_rgb[i])
            _save(outdir / f"{name}{SUFFIXES['gt']}", arrays["target_rgb"][i])
            refs = np.concatenate(list(arrays["src_rgbs"][i]), axis=1)
            _save(outdir / f"{name}{SUFFIXES['ref']}", refs)
    return outdir
