"""Train state: params + optional batch stats + Adam over NeRF params only.

Behavioral reference: src/models/diner.py:332-334 — the optimizer covers
`self.nerf.parameters()` only (the VGG loss tower is frozen; the renderer has
no parameters). Here optax.multi_transform freezes every top-level param
subtree except "nerf".
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import core, struct


class TrainState(struct.PyTreeNode):
    step: Any
    params: core.FrozenDict
    batch_stats: Optional[core.FrozenDict]
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads, batch_stats=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if batch_stats is None else batch_stats,
        )


def make_optimizer(params, lr: float = 1e-4, lr_schedule: str = "constant",
                   lr_decay_steps: int = 0,
                   lr_warmup_steps: int = 0) -> optax.GradientTransformation:
    """Adam on the `nerf` subtree; everything else (e.g. `vgg`) frozen.

    lr_schedule: "constant" (the reference's Adam, diner.py:40-43) or
    "cosine" (decay to lr/100 over lr_decay_steps, optional linear warmup) —
    a framework extension used by the synthetic-plateau study
    (PERFORMANCE.md round 3)."""
    if lr_schedule == "cosine" and lr_decay_steps <= 0:
        raise ValueError("lr_schedule='cosine' requires lr_decay_steps > 0 "
                         "(omitting it would silently train at constant lr)")
    if lr_schedule == "cosine":
        if lr_warmup_steps > 0:
            sched = optax.warmup_cosine_decay_schedule(
                0.0, lr, lr_warmup_steps, lr_decay_steps,
                end_value=lr * 0.01)
        else:
            sched = optax.cosine_decay_schedule(lr, lr_decay_steps,
                                                alpha=0.01)
    elif lr_schedule not in ("constant", "cosine"):
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")
    else:
        sched = lr

    def label(tree):
        return {k: ("nerf" if k == "nerf" else "frozen") for k in tree}
    return optax.multi_transform(
        {"nerf": optax.adam(sched), "frozen": optax.set_to_zero()},
        label(params))


def create_train_state(model, rng, example_batch, lr: float = 1e-4,
                       **opt_kwargs) -> TrainState:
    from diner_tpu.utils.jitinit import jit_init

    variables = jit_init(model.init)(rng, example_batch, jax.random.PRNGKey(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx = make_optimizer(params, lr, **opt_kwargs)
    return TrainState(step=0, params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), tx=tx)
