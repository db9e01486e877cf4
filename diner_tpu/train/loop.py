"""Training loop: data-parallel steps, orbax checkpoints, eval-in-the-loop.

Behavioral reference: python_scripts/train.py + the Lightning wiring in
src/models/diner.py:292-330 of malteprinzler/diner — per-step loss logging,
periodic checkpoints (every_n_train_steps=10000), periodic validation that
renders a deterministic subset to a folder, scores it (PSNR/SSIM/...), and
writes cam-sweep videos; rank-zero-only side effects.

TPU-native shape: one jitted train step consuming host-sharded batches; orbax
for checkpoints; JSONL metric log (plus TensorBoard if available).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Callable, Iterable, Optional

import jax
import numpy as np

from diner_tpu.parallel import (make_data_mesh_for_batch, replicate,
                                global_batch)
from diner_tpu.train.state import create_train_state
from diner_tpu.train.step import make_train_step


class MetricLogger:
    """JSONL metrics file + optional TensorBoard events (host 0 only).

    The reference logs through TensorBoardLogger (SURVEY.md §5.5); JSONL is
    the always-on machine-readable log, TB events are written when
    tensorflow is importable."""

    def __init__(self, logdir, tensorboard: bool = True):
        self.path = Path(logdir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                import tensorflow as tf

                self._tb = tf.summary.create_file_writer(
                    str(Path(logdir) / "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: dict):
        rec = {"step": int(step)}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in rec.items():
                    if k != "step":
                        tf.summary.scalar(k, v, step=int(step))
                self._tb.flush()


def save_checkpoint(ckpt_dir, state, step: int):
    from diner_tpu.train.ckpt_io import orbax_save

    orbax_save(ckpt_dir, step,
               {"params": state.params,
                "batch_stats": state.batch_stats or {},
                "opt_state": state.opt_state,
                "step": np.asarray(step)})


def restore_checkpoint(ckpt_dir, state, step: Optional[int] = None):
    """Restore params/batch_stats (and optimizer state when present) into
    `state`; returns (state, step)."""
    from diner_tpu.train.ckpt_io import adopt_opt_state, orbax_restore_latest

    restored, step = orbax_restore_latest(ckpt_dir, step)
    if restored is None:
        return state, 0
    opt_state = adopt_opt_state(restored, state.opt_state)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"] or None,
        opt_state=opt_state,
        step=int(restored["step"]))
    return state, int(restored["step"])


def train(model, train_batches: Iterable, logdir, *,
          example_batch=None, lr: float = 1e-4, opt_kwargs=None,
          max_steps: int = 100,
          log_every: int = 50, ckpt_every: int = 10_000,
          val_every: Optional[int] = None,
          val_fn: Optional[Callable] = None,
          resume: bool = False, mesh=None, seed: int = 0):
    """Generic loop. `train_batches` yields contract batches (numpy, global
    batch across hosts not yet split: shard_batch places them on the mesh).
    `val_fn(state, step)` runs rank-zero validation side effects."""
    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    logger = MetricLogger(logdir)

    it = iter(train_batches)
    if example_batch is None:
        example_batch = next(it)
    if mesh is None:
        bs = next(v.shape[0] for v in example_batch.values()
                  if hasattr(v, "shape"))
        # conf batch size is per-process (DDP semantics); the mesh spans
        # the GLOBAL batch across all hosts
        mesh = make_data_mesh_for_batch(bs * jax.process_count())

    rng = jax.random.PRNGKey(seed)
    state = create_train_state(model, rng, example_batch, lr=lr,
                               **(opt_kwargs or {}))
    start_step = 0
    if resume:
        state, start_step = restore_checkpoint(logdir / "ckpts", state)
    state = state.replace(params=replicate(state.params, mesh),
                          opt_state=replicate(state.opt_state, mesh))

    step_fn = make_train_step(model)
    is_host0 = jax.process_index() == 0
    t0 = time.perf_counter()

    step = start_step
    last_logged = start_step - 1
    for step in range(start_step, max_steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_batches)
            batch = next(it)
        batch = global_batch(batch, mesh)
        rng, key = jax.random.split(rng)
        state, losses = step_fn(state, batch, key)

        if is_host0 and (step % log_every == 0 or step == max_steps - 1):
            scalars = {k: float(v) for k, v in losses.items()}
            scalars["steps_per_sec"] = (step - last_logged) / max(
                time.perf_counter() - t0, 1e-9)
            last_logged = step
            t0 = time.perf_counter()
            logger.log(step, scalars)
        if ckpt_every and (step + 1) % ckpt_every == 0 \
                and step + 1 < max_steps:
            # ALL processes enter the save: serializing globally-placed
            # arrays is collective in orbax — a host-0-only save deadlocks
            # multi-host training at the first checkpoint.
            # Label = STEPS COMPLETED (step+1, same convention as the final
            # save): labeling with `step` made resume re-apply an
            # already-applied update
            save_checkpoint(logdir / "ckpts", state, step + 1)
        if val_every and val_fn and step > 0 and step % val_every == 0 and is_host0:
            val_fn(_host_local_state(state), step)

    if max_steps > start_step:
        # only if steps actually ran: re-saving on a no-op resume would creep
        # the checkpoint step past max_steps and break later re-scoring.
        # Saved BEFORE the final validation — val_fn renders full images (a
        # realistic crash/OOM site) and must not be able to lose the run.
        save_checkpoint(logdir / "ckpts", state, step + 1)
    # final validation at max_steps: the loop body runs steps
    # [start_step, max_steps), so the in-loop val never sees the finished
    # model — without this the last recorded score trails by up to val_every
    # (>=: resuming an already-finished run re-scores the final checkpoint)
    if val_every and val_fn and 0 < max_steps and max_steps >= start_step and is_host0:
        val_fn(_host_local_state(state), max_steps)
    return state


def _host_local_state(state):
    """A copy of `state` whose arrays are host-local (numpy), for rank-0-only
    validation: the val renders then compile against local devices and issue
    no cross-host collectives (which would deadlock the other ranks that
    skip validation). Fully-replicated arrays are host-readable everywhere.
    Single-process training returns the state unchanged."""
    import jax

    if jax.process_count() == 1:
        return state
    return state.replace(
        params=jax.device_get(state.params),
        batch_stats=(jax.device_get(state.batch_stats)
                     if state.batch_stats is not None else None))
