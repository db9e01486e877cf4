"""Multi-chip rendering: rays sharded over the mesh `data` axis.

Rays are embarrassingly parallel (SURVEY.md §5.7): a full-image render shards
the flattened ray axis across devices with shard_map — the scene encoding and
parameters are replicated, each chip renders its ray slice with the same
chunked pipeline, and the image is reassembled by the output sharding. No
collectives are needed in the hot loop (the one true data-parallel case).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.renderer.renderer import render_rays


def render_image_sharded(field_fn, rng, rays, enc: SceneEncoding,
                         cfg: RenderConfig, mesh, axis: str = "data",
                         chunk: int = 4096):
    """rays: (SB, H, W, 8) -> (rgb (SB, H, W, 3), depth (SB, H, W)).

    field_fn must close over replicated (unsharded) arrays only.
    """
    SB, H, W, _ = rays.shape
    n_dev = mesh.shape[axis]
    n = H * W
    per_dev = -(-n // n_dev)
    # pad the ray axis so it splits evenly; padded rays recompute the last ray
    n_pad = per_dev * n_dev - n
    flat = rays.reshape(SB, n, 8)
    if n_pad:
        flat = jnp.concatenate([flat, flat[:, -1:].repeat(n_pad, axis=1)], 1)
    flat = flat.reshape(SB, n_dev, per_dev, 8).swapaxes(0, 1)  # (D, SB, P, 8)
    flat = flat.reshape(n_dev * SB, per_dev, 8)  # leading dim sharded

    n_chunks = -(-per_dev // chunk)
    pad2 = n_chunks * chunk - per_dev

    def local(rays_local, enc_local, key):
        # rays_local: (SB, per_dev, 8) on this device (shard_map strips the
        # sharded leading dim down to SB rows)
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        r = rays_local
        if pad2:
            r = jnp.concatenate([r, r[:, -1:].repeat(pad2, axis=1)], 1)
        chunks = r.reshape(r.shape[0], n_chunks, chunk, 8).swapaxes(0, 1)
        keys = jax.random.split(key, n_chunks)

        def body(args):
            k, rc = args
            out = render_rays(field_fn, k, rc, enc_local, cfg)
            return out["rgb"], out["depth"]

        rgb, depth = jax.lax.map(body, (keys, chunks))
        rgb = rgb.swapaxes(0, 1).reshape(r.shape[0], -1, 3)[:, :per_dev]
        depth = depth.swapaxes(0, 1).reshape(r.shape[0], -1)[:, :per_dev]
        return rgb, depth

    fn = shard_map(local, mesh=mesh,
                   in_specs=(P(axis), P(), P()),
                   out_specs=P(axis), check_vma=False)
    rgb, depth = jax.jit(fn)(flat, enc, rng)
    rgb = rgb.reshape(n_dev, SB, per_dev, 3).swapaxes(0, 1).reshape(SB, -1, 3)
    depth = depth.reshape(n_dev, SB, per_dev).swapaxes(0, 1).reshape(SB, -1)
    return (rgb[:, :n].reshape(SB, H, W, 3),
            depth[:, :n].reshape(SB, H, W))
