"""Build models/datasets/loaders from reference-shaped YAML configs.

Behavioral reference: the config schema of configs/train_dtu.yaml in
malteprinzler/diner (data/nerf/renderer/optimizer/trainer sections with
module+kwargs wiring, SURVEY.md §5.6) — same declarative shape, resolved
against the explicit registry (datasets) and typed constructors (models).
"""

from __future__ import annotations

from typing import Any, Dict

from diner_tpu.core.config import build as registry_build
from diner_tpu.core.types import RenderConfig
from diner_tpu.data.loader import BatchLoader
from diner_tpu.models import PixelNeRF
from diner_tpu.models.diner import DINER

# dataset registrations
import diner_tpu.data.dtu  # noqa: F401
import diner_tpu.data.facescape  # noqa: F401
import diner_tpu.data.multiface  # noqa: F401
from diner_tpu.core.config import register
from diner_tpu.data.synthetic import SyntheticSphereDataset

register("SyntheticSphereDataset")(SyntheticSphereDataset)


def build_dataset(conf: Dict[str, Any], stage: str):
    return registry_build(conf["dataset"], stage=stage) \
        if "stage" in _ctor_args(conf["dataset"]) else registry_build(conf["dataset"])


def _ctor_args(dconf):
    import inspect

    from diner_tpu.core.config import resolve

    cls = resolve(dconf["module"])
    return inspect.signature(cls.__init__ if isinstance(cls, type) else cls
                             ).parameters


def build_loader(conf: Dict[str, Any], dataset, shuffle_default: bool):
    kw = dict(conf.get("dataloader", {}).get("kwargs", {}))
    return BatchLoader(dataset,
                       batch_size=int(kw.get("batch_size", 1)),
                       shuffle=bool(kw.get("shuffle", shuffle_default)),
                       num_threads=int(kw.get("num_workers", 4)))


def build_nerf(conf: Dict[str, Any]) -> PixelNeRF:
    nerf_kw = dict(conf.get("kwargs", {}))
    enc_kw = dict(nerf_kw.pop("encoder_conf", {}).get("kwargs", {}))
    pos_kw = dict(nerf_kw.pop("poscode_conf", {}).get("kwargs", {}))
    mlp_kw = dict(nerf_kw.pop("mlp_fine_conf", {}).get("kwargs", {}))
    mlp_kw.pop("combine_type", None)  # only "average" exists (resnetfc.py:9-14)
    return PixelNeRF(
        num_freqs=int(pos_kw.get("num_freqs", 6)),
        freq_factor=float(pos_kw.get("freq_factor", 6.28)),
        backbone=enc_kw.get("backbone", "resnet34"),
        encoder_layers=int(enc_kw.get("num_layers", 4)),
        encoder_norm=enc_kw.get("norm", "group"),
        image_padding=int(enc_kw.get("image_padding", 64)),
        padding_pe=int(enc_kw.get("padding_pe", 4)),
        n_blocks=int(mlp_kw.get("n_blocks", 5)),
        d_hidden=int(mlp_kw.get("d_hidden", 512)),
        combine_layer=int(mlp_kw.get("combine_layer", 3)),
        **nerf_kw)


def build_render_cfg(conf: Dict[str, Any]) -> RenderConfig:
    kw = dict(conf.get("kwargs", {}))
    n_samples = int(kw.get("n_samples", 40))
    # the reference's eval_batch_size counts POINTS (nerf_renderer.py:28);
    # our render tiles are in RAYS — accept either knob from YAML
    if "eval_chunk_rays" in kw:
        eval_chunk_rays = int(kw["eval_chunk_rays"])
    elif "eval_batch_size" in kw:
        eval_chunk_rays = max(1, int(kw["eval_batch_size"]) // n_samples)
    else:
        eval_chunk_rays = 8192
    return RenderConfig(
        n_samples=n_samples,
        n_depth_candidates=int(kw.get("n_depth_candidates", 1000)),
        n_gaussian=int(kw.get("n_gaussian", 15)),
        depth_diff_max=float(kw.get("depth_diff_max", 0.05)),
        white_bkgd=bool(kw.get("white_bkgd", False)),
        eval_chunk_rays=eval_chunk_rays,
        approx_topk=bool(kw.get("approx_topk", True)),
        prior_stride=int(kw.get("prior_stride", 1)),
        n_prior_anchors=int(kw.get("n_prior_anchors", 0)),
        anchor_field_depth=bool(kw.get("anchor_field_depth", True)),
        paired_prior_gather=bool(kw.get("paired_prior_gather", False)))


def build_diner(conf: Dict[str, Any], znear: float, zfar: float) -> DINER:
    opt_kw = dict(conf.get("optimizer", {}).get("kwargs", {}))
    return DINER(
        nerf=build_nerf(conf["nerf"]),
        render_cfg=build_render_cfg(conf.get("renderer", {})),
        znear=float(znear), zfar=float(zfar),
        ray_batch_size=int(opt_kw.get("ray_batch_size", 128)),
        w_vgg=float(opt_kw.get("w_vgg", 0.0)),
        vgg_spatch=int(opt_kw.get("vgg_spatch", 64)),
        w_antibias=float(opt_kw.get("w_antibias", 0.0)),
        antibias_downsampling=int(opt_kw.get("antibias_downsampling", 3)),
        erode_fg_mask=int(opt_kw.get("erode_fg_mask", 0)))
