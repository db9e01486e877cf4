"""Multi-chip rendering: rays sharded over a mesh axis.

Rays are embarrassingly parallel (SURVEY.md §5.7): a full-image render shards
the flattened ray axis across devices with shard_map — the scene encoding and
parameters are replicated, each chip renders its ray slice with the same
chunked pipeline, and the image is reassembled by the output sharding. No
collectives are needed in the hot loop (the one true data-parallel case).

The compiled program is cached per (field_fn, mesh, axis, cfg, chunk): the
scene encoding and rays are TRACED arguments, so rendering many frames (or
many scenes) with the same field_fn never recompiles. Callers must therefore
build `field_fn` once and reuse it; its signature takes the encoding first:

    field_fn(enc, pts, dirs, epi_aux=None) -> (SB, N, 4)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.renderer.renderer import render_flat_chunked

import weakref

# field_fn is weak-keyed: programs die with the closure that owns them, so a
# caller that (wrongly) rebuilds field_fn per frame leaks compilations into
# jit's own cache but not here
_PROGRAM_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _build_program(field_fn, mesh, axis: str, cfg: RenderConfig, chunk: int):
    def local(rays_local, enc_local, key):
        # rays_local: (SB, per_dev, 8) on this device (shard_map strips the
        # sharded leading dim down to SB rows); per-device key decorrelates
        # the stratified/refill randomness across shards
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))

        def ff(pts, dirs, epi_aux=None):
            return field_fn(enc_local, pts, dirs, epi_aux)

        return render_flat_chunked(ff, key, rays_local, enc_local, cfg, chunk)

    return jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(P(axis), P(), P()),
                             out_specs=P(axis), check_vma=False))


def render_image_sharded(field_fn, rng, rays, enc: SceneEncoding,
                         cfg: RenderConfig, mesh, axis: str = "data",
                         chunk: int = 4096):
    """rays: (SB, H, W, 8) -> (rgb (SB, H, W, 3), depth (SB, H, W)).

    field_fn: (enc, pts, dirs, epi_aux=None) -> (SB, N, 4); must use only
    the encoding passed to it (plus replicated closure arrays like params).
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

    per_fn = _PROGRAM_CACHE.setdefault(field_fn, {})
    cache_key = (mesh, axis, cfg, chunk)
    fn = per_fn.get(cache_key)
    if fn is None:
        fn = _build_program(field_fn, mesh, axis, cfg, chunk)
        per_fn[cache_key] = fn

    rgb, depth = fn(flat, enc, rng)
    rgb = rgb.reshape(n_dev, SB, per_dev, 3).swapaxes(0, 1).reshape(SB, -1, 3)
    depth = depth.reshape(n_dev, SB, per_dev).swapaxes(0, 1).reshape(SB, -1)
    return (rgb[:, :n].reshape(SB, H, W, 3),
            depth[:, :n].reshape(SB, H, W))
