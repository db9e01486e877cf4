"""Serving demo: encode a scene once, render novel views from many threads.

Run: python examples/serve_demo.py  (CPU-runnable; uses TPU when present)
"""

from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax.numpy as jnp

from diner_tpu.core.types import RenderConfig
from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
from diner_tpu.models import PixelNeRF
from diner_tpu.serve import RenderServer


def main():
    H = W = 64
    model = PixelNeRF(encoder_layers=2, encoder_norm="group", image_padding=4,
                      padding_pe=2, n_blocks=3, d_hidden=128, combine_layer=2,
                      quad_latent=True)
    ds = SyntheticSphereDataset(n_scenes=2, n_views=3, H=H, W=W)
    batch = {k: jnp.asarray(v)
             for k, v in to_device_batch(collate([ds[0]])).items()}
    import jax

    xyz = jnp.zeros((1, 1, 3))
    variables = model.init(jax.random.PRNGKey(0), batch["src_rgbs"],
                           batch["src_depths"], batch["src_depth_stds"],
                           batch["src_extrinsics"], batch["src_intrinsics"],
                           xyz, xyz)

    server = RenderServer(
        model, variables,
        RenderConfig(n_samples=12, n_depth_candidates=128, n_gaussian=4,
                     n_prior_anchors=32),
        znear=ds.znear, zfar=ds.zfar, buckets=((H, W),), chunk=1024)

    for i in range(2):
        b = {k: jnp.asarray(v)
             for k, v in to_device_batch(collate([ds[i]])).items()}
        server.load_scene(f"scene{i}", b["src_rgbs"], b["src_depths"],
                          b["src_depth_stds"], b["src_extrinsics"],
                          b["src_intrinsics"])
    print("scenes:", server.scene_ids())

    def request(i):
        b = {k: jnp.asarray(v)
             for k, v in to_device_batch(collate([ds[i % 2]])).items()}
        rgb, depth = server.render(f"scene{i % 2}", b["target_extrinsics"],
                                   b["target_intrinsics"], H, W, seed=i)
        return np.asarray(rgb)

    request(0)  # warm compile
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=4) as pool:
        frames = list(pool.map(request, range(8)))
    dt = time.perf_counter() - t0
    assert all(np.isfinite(f).all() for f in frames)
    print(f"8 concurrent renders in {dt:.2f}s "
          f"({8 * H * W / dt:.0f} rays/s aggregate)")


if __name__ == "__main__":
    main()
