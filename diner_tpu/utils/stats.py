"""Small tensor statistics helpers.

Behavioral reference: src/util/torch_helpers.py:215-223 (weighted_mean_n_std)
in malteprinzler/diner — used by the Gaussian refit stage of the depth-guided
sampler (also inlined there for fusion into the sampler program).
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_mean_and_std(x, weights, axis: int = -1, keepdims: bool = False):
    """Weighted mean and (biased) weighted std along `axis`."""
    wsum = jnp.sum(weights, axis=axis, keepdims=True)
    wn = weights / jnp.where(wsum == 0, 1.0, wsum)
    mean = jnp.sum(x * wn, axis=axis, keepdims=True)
    std = jnp.sqrt(jnp.sum((x - mean) ** 2 * wn, axis=axis, keepdims=True))
    if not keepdims:
        mean = jnp.squeeze(mean, axis)
        std = jnp.squeeze(std, axis)
    return mean, std
