"""Scene-cache render server: encode once, render many (production serving).

The reference has no serving layer (eval scripts re-encode per batch); this
is the TPU-native deployment shape the framework is built for:

- `RenderServer.load_scene(...)` runs the encoder ONCE and keeps the
  `SceneEncoding` device-resident (optionally quad-packed / int8-quantized
  via the model's knobs — see PixelNeRF.quad_latent / latent_quant).
- `render(scene_id, extrinsics, intrinsics, ...)` renders novel views with
  the single pre-compiled render program (epipolar-anchor fast path per
  RenderConfig); repeated calls never recompile because every request is
  padded to the server's static (H, W) buckets.
- Requests are thread-safe: JAX dispatch is serialized per device anyway,
  so a simple lock keeps the scene table consistent while letting callers
  come from any thread (e.g. an HTTP front end).

This is a library; wire it behind any transport. `examples/serve_demo.py`
drives it end to end.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from diner_tpu.core.types import RenderConfig, SceneEncoding
from diner_tpu.geometry import gen_rays
from diner_tpu.renderer import render_image


class RenderServer:
    """Holds encoded scenes and a pre-compiled render program.

    model: a PixelNeRF (or DINER.nerf) instance; variables: its weights.
    buckets: allowed (H, W) output sizes — every request must match one
    (static shapes keep a single compiled program per bucket).
    """

    @classmethod
    def from_preset(cls, config_path, variables, znear: float, zfar: float,
                    **kw):
        """Build a server from a YAML render preset — e.g. the CERTIFIED
        fast preset (configs/evaluate_diner_on_dtu_fast.yaml: prior anchors
        A=96 + quad latent + bf16, -0.06 dB vs GT on the trained checkpoint;
        PERFORMANCE.md round 4 has the per-shape throughput table).
        `variables` must match the preset's model dims (e.g. a checkpoint
        trained with the paired train config)."""
        from diner_tpu.cli.build import build_nerf, build_render_cfg
        from diner_tpu.core.config import load_config

        conf = load_config(config_path)
        return cls(build_nerf(conf.get("nerf", {})), variables,
                   build_render_cfg(conf.get("renderer", {})),
                   znear, zfar, **kw)

    def __init__(self, model, variables, cfg: RenderConfig,
                 znear: float, zfar: float,
                 buckets: Tuple[Tuple[int, int], ...] = ((256, 320),),
                 chunk: int = 8192):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.znear, self.zfar = float(znear), float(zfar)
        self.buckets = tuple(buckets)
        self.chunk = chunk
        self._scenes: Dict[str, SceneEncoding] = {}
        self._lock = threading.Lock()

        model_ref = model
        variables_ref = variables

        def _encode(src_rgbs, src_depths, src_stds, src_ext, src_K):
            return model_ref.apply(variables_ref, src_rgbs, src_depths,
                                   src_stds, src_ext, src_K, method="encode")

        self._encode = jax.jit(_encode)
        self._render = {}
        for H, W in self.buckets:
            self._render[(H, W)] = self._make_render(H, W)

    def _make_render(self, H: int, W: int):
        model, variables, cfg, chunk = (self.model, self.variables,
                                        self.cfg, self.chunk)

        @jax.jit
        def _render(enc, target_ext, target_K, rng):
            rays = gen_rays(target_ext, target_K, W, H,
                            jnp.full((target_ext.shape[0],), self.znear),
                            jnp.full((target_ext.shape[0],), self.zfar))
            return render_image(
                lambda p, d, aux=None: model.apply(variables, enc, p, d, aux,
                                                   method="field"),
                rng, rays, enc, cfg, chunk=chunk)

        return _render

    # -- scene management ---------------------------------------------------
    def load_scene(self, scene_id: str, src_rgbs, src_depths, src_depth_stds,
                   src_extrinsics, src_intrinsics) -> None:
        """Encode source views once; the encoding stays device-resident."""
        enc = self._encode(jnp.asarray(src_rgbs), jnp.asarray(src_depths),
                           jnp.asarray(src_depth_stds),
                           jnp.asarray(src_extrinsics),
                           jnp.asarray(src_intrinsics))
        jax.block_until_ready(enc.latent)
        with self._lock:
            self._scenes[scene_id] = enc

    def unload_scene(self, scene_id: str) -> bool:
        with self._lock:
            return self._scenes.pop(scene_id, None) is not None

    def scene_ids(self):
        with self._lock:
            return sorted(self._scenes)

    # -- rendering ----------------------------------------------------------
    def render(self, scene_id: str, target_extrinsics, target_intrinsics,
               H: int, W: int, seed: int = 0):
        """-> (rgb (SB, H, W, 3) f32 in [0, 1], depth (SB, H, W) f32)."""
        if (H, W) not in self._render:
            raise ValueError(f"size {(H, W)} not in buckets {self.buckets}")
        with self._lock:
            enc = self._scenes.get(scene_id)
        if enc is None:
            raise ValueError(
                f"unknown scene {scene_id!r}; loaded: {self.scene_ids()}")
        rgb, depth = self._render[(H, W)](
            enc, jnp.asarray(target_extrinsics),
            jnp.asarray(target_intrinsics), jax.random.PRNGKey(seed))
        return rgb, depth
