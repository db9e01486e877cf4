"""jit-compiled train/eval steps (SPMD data parallel).

The step is a single XLA program: with the batch sharded over the mesh `data`
axis and params replicated, XLA inserts the gradient all-reduce over ICI —
the TPU-native equivalent of the reference's DDP/NCCL loop (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_train_step(model):
    """Returns train_step(state, batch, rng) -> (state, loss_dict)."""

    def train_step(state, batch, rng):
        has_stats = state.batch_stats is not None

        def loss_fn(params):
            variables = {"params": params}
            if has_stats:
                variables["batch_stats"] = state.batch_stats
                out, mutated = model.apply(
                    variables, batch, rng, train=True,
                    method="losses", mutable=["batch_stats"])
                return out["total"], (out, mutated["batch_stats"])
            out = model.apply(variables, batch, rng, train=True, method="losses")
            return out["total"], (out, None)

        grads, (loss_dict, new_stats) = jax.grad(loss_fn, has_aux=True)(state.params)
        # NaN guard: skip the update on non-finite loss (the reference raises
        # NanError and skips the batch, deps/TransMVSNet/train.py:213-227).
        # The WHOLE batch is discarded: gradients are zeroed AND the mutated
        # BatchNorm running stats are rolled back — stats computed from NaN
        # activations would otherwise poison every later forward permanently.
        finite = jnp.isfinite(loss_dict["total"])
        grads = jax.tree.map(lambda g: jnp.where(finite, g, 0.0), grads)
        if new_stats is not None and state.batch_stats is not None:
            new_stats = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                                     new_stats, state.batch_stats)
        loss_dict = dict(loss_dict)
        loss_dict["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        prev = state
        state = state.apply_gradients(grads=grads, batch_stats=new_stats)
        # roll the ENTIRE state back on a skipped batch: even with zeroed
        # grads, Adam would decay its momentum buffers, advance its count,
        # and move params along stale momentum — the reference's NanError
        # path leaves the optimizer untouched (train.py:213-227)
        state = jax.tree.map(lambda n, o: jnp.where(finite, n, o),
                             state, prev)
        return state, loss_dict

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model):
    """Returns eval_step(state, batch, rng) -> loss_dict (no grad)."""

    def eval_step(state, batch, rng):
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        return model.apply(variables, batch, rng, train=False, method="losses")

    return jax.jit(eval_step)
