"""Colormap application for depth visualization (host-side).

Behavioral reference: src/util/torch_helpers.py:42-75 (torch_cmap) in
malteprinzler/diner: per-image min/max normalization then a matplotlib colormap.
"""

from __future__ import annotations

import numpy as np


def colormap(x, cmap: str = "viridis", vmin=None, vmax=None):
    """Map (..., H, W, 1) scalar images to (..., H, W, 3) RGB via matplotlib.

    Normalizes each image independently to [0, 1] unless vmin/vmax given.
    Runs on host (numpy); not a jit op.
    """
    import matplotlib.pyplot as plt

    x = np.asarray(x, dtype=np.float64)
    shape = x.shape
    flat = x.reshape(-1, shape[-3], shape[-2])  # (B, H, W)
    lo = vmin if vmin is not None else flat.min(axis=(1, 2), keepdims=True)
    hi = vmax if vmax is not None else flat.max(axis=(1, 2), keepdims=True)
    denom = np.where(hi - lo == 0, 1.0, hi - lo)
    normed = (flat - lo) / denom
    rgb = plt.get_cmap(cmap)(normed)[..., :3]  # (B, H, W, 3)
    return rgb.reshape(*shape[:-1], 3).astype(np.float32)
