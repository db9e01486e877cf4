"""Probe: distinct-quad-cell counts along each ray's sample track, per view.

The flagship render's dominant HBM cost is the per-(ray,sample,view) quad-row
gather (26 ms of a 70 ms chunk, scripts/decompose_flagship.py). Depth-guided
samples cluster within a few texels, so consecutive samples mostly land in the
SAME quad cell — each ray only touches G distinct cells. If G is small, a
run-length-dedup gather (fetch K >= G rows per ray, reconstruct per-sample
rows with an exact one-hot MXU contraction) cuts gather rows n_samples/K-fold
with EXACT bilinear semantics wherever G <= K.

This script measures the distribution of G at the flagship bench shape
(the workload bench.py times) to size K.

Usage: python scripts/probe_cell_runs.py [--chunks 4]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402  (sets up compilation cache)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--chunk", type=int, default=4096)
    args = ap.parse_args(argv)

    from diner_tpu.data import SyntheticSphereDataset, collate, to_device_batch
    from diner_tpu.geometry import (gen_rays, transform_points,
                                    project_points)
    from diner_tpu.image_ops.grid_sample import quad_cells
    from diner_tpu.models.pixelnerf import _scale_uv_for_feature_padding
    from diner_tpu.renderer.composite import sample_points
    from diner_tpu.sampler import sample_depthguided
    from diner_tpu.utils.jitinit import jit_init

    nerf, cfg = bench._certified_model_and_cfg()
    H, W = bench.H, bench.W

    ds = SyntheticSphereDataset(n_scenes=1, n_views=4, H=H, W=W)
    batch = to_device_batch(collate([ds[0]]))
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if not isinstance(v, list)}

    variables = jit_init(nerf.init)(
        jax.random.PRNGKey(0), batch["src_rgbs"], batch["src_depths"],
        batch["src_depth_stds"], batch["src_extrinsics"],
        batch["src_intrinsics"], jnp.zeros((1, 1, 3)), jnp.zeros((1, 1, 3)))

    @jax.jit
    def probe(variables, batch, rays_chunk, key):
        enc = nerf.apply(variables, batch["src_rgbs"], batch["src_depths"],
                         batch["src_depth_stds"], batch["src_extrinsics"],
                         batch["src_intrinsics"], method="encode")
        z, aux = sample_depthguided(key, rays_chunk, enc, cfg,
                                    return_aux=True)
        points, _ = sample_points(rays_chunk, z)  # (SB, NR*NS, 3)
        SB, B, _ = points.shape
        NV = enc.poses.shape[1]
        xyz_nv = jnp.broadcast_to(points[:, None], (SB, NV, B, 3))
        xyz_cam = transform_points(enc.poses, xyz_nv)
        uv = project_points(xyz_cam, enc.focal, enc.c, enc.image_shape)
        uvs = _scale_uv_for_feature_padding(enc, uv)
        Hq, Wq = enc.latent_quad.shape[-3:-1]
        idx, _, _ = quad_cells(Hq, Wq, uvs)  # (SB, NV, B)
        NR = rays_chunk.shape[1]
        NS = B // NR
        idx_s = idx.reshape(SB, NV, NR, NS)
        neq = idx_s[..., 1:] != idx_s[..., :-1]
        g = jnp.sum(neq.astype(jnp.int32), axis=-1) + 1  # distinct cells G
        return g.reshape(-1)

    rays_full = gen_rays(batch["target_extrinsics"],
                         batch["target_intrinsics"], W, H,
                         ds.znear, ds.zfar).reshape(1, H * W, 8)

    gs = []
    for i in range(args.chunks):
        chunk_rays = rays_full[:, i * args.chunk:(i + 1) * args.chunk]
        g = probe(variables, batch, chunk_rays,
                  jax.random.fold_in(jax.random.PRNGKey(0), i))
        gs.append(np.asarray(g))
    g = np.concatenate(gs)

    qs = {f"p{p}": int(np.percentile(g, p))
          for p in (50, 90, 99, 99.9, 100)}
    out = {
        "n_ray_views": int(g.size),
        "n_samples_per_ray": 40,
        "mean_distinct_cells": round(float(g.mean()), 2),
        **qs,
        "frac_le": {str(k): round(float((g <= k).mean()), 5)
                    for k in (4, 6, 8, 10, 12, 16, 20, 24)},
    }
    print(json.dumps(out, indent=1))
    Path("results/probe_cell_runs_r4.json").write_text(json.dumps(out))


if __name__ == "__main__":
    main()
