"""Pallas TPU kernel: expand per-anchor prior values to per-candidate values.

The epipolar-anchor sampler (RenderConfig.n_prior_anchors) gathers priors at
K anchors per (ray, view) group and must then give each of the NC depth
candidates its anchor's values: out[g, :, t] = vals[g, :, a[g, t]].

Doing this with XLA gathers costs as much as the original big gather (the
gather unit is issue-rate bound: NC lookups per group either way), and XLA
one-hot matmuls materialize the one-hot in HBM. This kernel builds the
(K, NC) one-hot in VMEM from iota+compare (no per-element indexing — TPU
Pallas cannot gather) and contracts it on the MXU, so the only HBM traffic is
the inputs and the (G, C, NC) result.

Layout note: the tiny channel dim C=5 must sit in the SUBLANE position —
(..., NC, C) arrays get (8, 128)-tiled to (..., NC, 128), a 25x HBM blow-up
(observed: 15.6G for a 625M copy). Hence (G, C, NC) in/out layouts here.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _remap_kernel(a_ref, vals_ref, out_ref, *, tg: int, exact: bool):
    """a: (TG, NC) int32 anchor ids; vals: (TG, C, K); out: (TG, C, NC)."""
    K = vals_ref.shape[-1]
    NC = a_ref.shape[-1]
    dot_dtype = jnp.float32 if exact else jnp.bfloat16
    # exact mode needs the multi-pass product: the MXU's default f32 dot
    # multiplies in bf16, rounding the selected values (~0.4%) — with
    # HIGHEST and an exactly-representable 0/1 operand the selection is
    # bit-exact (observed on v5e; see pallas_likelihood.py)
    prec = jax.lax.Precision.HIGHEST if exact else jax.lax.Precision.DEFAULT
    iota_k = jax.lax.broadcasted_iota(jnp.int32, (K, NC), 0)
    for g in range(tg):
        onehot = (iota_k == a_ref[g, :][None, :]).astype(dot_dtype)
        vals = vals_ref[g].astype(dot_dtype)  # (C, K)
        out_ref[g] = jax.lax.dot_general(
            vals, onehot, (((1,), (0,)), ((), ())), precision=prec,
            preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("tg", "interpret", "exact"))
def remap_anchors_pallas(a, vals, tg: int = 8, interpret: bool = False,
                         exact: bool = False):
    """out[g, c, t] = vals[g, c, a[g, t]].

    a: (G, NC) int32 in [0, K); vals: (G, C, K) f32. Returns (G, C, NC) f32.
    G is padded to a multiple of `tg` internally. With exact=False the one-hot
    matmul runs in bf16 (values round to bf16, which is already the precision
    class of the bf16 compute path); exact=True keeps it f32 — the one-hot
    contraction sums exactly one unrounded f32 term per output, bit-exact
    selection at a lower (but here negligible) MXU rate.
    """
    G, NC = a.shape
    _, C, K = vals.shape
    Gp = -(-G // tg) * tg
    if Gp != G:
        a = jnp.pad(a, ((0, Gp - G), (0, 0)))
        vals = jnp.pad(vals, ((0, Gp - G), (0, 0), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_remap_kernel, tg=tg, exact=exact),
        out_shape=jax.ShapeDtypeStruct((Gp, C, NC), jnp.float32),
        grid=(Gp // tg,),
        in_specs=[
            pl.BlockSpec((tg, NC), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tg, C, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tg, C, NC), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(a, vals)
    return out[:G]
