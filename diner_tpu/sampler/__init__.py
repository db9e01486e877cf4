from diner_tpu.sampler.depth_guided import (
    EpiAnchors,
    sample_stratified,
    surface_likelihoods,
    sample_depthguided,
    fill_uniform,
    gather_priors,
    anchor_ids,
)

__all__ = [
    "EpiAnchors",
    "sample_stratified",
    "surface_likelihoods",
    "sample_depthguided",
    "fill_uniform",
    "gather_priors",
    "anchor_ids",
]
