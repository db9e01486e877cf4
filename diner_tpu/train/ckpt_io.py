"""Shared orbax checkpoint IO for the DINER trainer and the MVS CLI.

One implementation of the save/restore conventions both training paths use
(the two used to carry near-identical copies that drifted — the DINER loop's
periodic-save step labeling diverged from the MVS CLI's):
  - checkpoints keyed by STEPS COMPLETED,
  - re-saving an existing step is a no-op (a resumed run's first periodic
    save can land on the step it restored from; orbax raises otherwise),
  - targetless restore (tolerates payload-layout evolution),
  - optimizer state adopted only when its leaf count still matches.
"""

from __future__ import annotations

from pathlib import Path


def orbax_save(ckpt_dir, step: int, payload: dict) -> None:
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(str(ckpt_dir)) as mgr:
        if step in mgr.all_steps():
            return
        mgr.save(step, args=ocp.args.StandardSave(payload), force=True)


def orbax_restore_latest(ckpt_dir, step=None):
    """-> (payload dict, step) or (None, 0) when nothing exists yet."""
    import orbax.checkpoint as ocp

    ckpt_dir = Path(ckpt_dir).resolve()
    if not ckpt_dir.exists():
        return None, 0
    with ocp.CheckpointManager(str(ckpt_dir)) as mgr:
        step = mgr.latest_step() if step is None else step
        if step is None:
            return None, 0
        # targetless restore: StandardRestore with a fixed target raises on
        # any tree mismatch in this orbax version
        return mgr.restore(step), int(step)


def adopt_opt_state(restored: dict, opt_state):
    """Take the checkpoint's optimizer state when its layout still matches
    `opt_state`; otherwise keep (reinitialize with) the given one."""
    import jax

    if "opt_state" not in restored:
        print("resume: checkpoint has no optimizer state; reinitializing",
              flush=True)
        return opt_state
    got = jax.tree.leaves(restored["opt_state"])
    if len(got) != len(jax.tree.leaves(opt_state)):
        print("resume: optimizer state layout changed; reinitializing",
              flush=True)
        return opt_state
    return jax.tree.unflatten(jax.tree.structure(opt_state), got)
