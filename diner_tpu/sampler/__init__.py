from diner_tpu.sampler.depth_guided import (
    sample_stratified,
    surface_likelihoods,
    sample_depthguided,
    fill_uniform,
    gather_priors,
)

__all__ = [
    "sample_stratified",
    "surface_likelihoods",
    "sample_depthguided",
    "fill_uniform",
    "gather_priors",
]
