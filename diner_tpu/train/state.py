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


def make_optimizer(params, lr: float = 1e-4) -> optax.GradientTransformation:
    """Adam on the `nerf` subtree; everything else (e.g. `vgg`) frozen."""
    def label(tree):
        return {k: ("nerf" if k == "nerf" else "frozen") for k in tree}
    return optax.multi_transform(
        {"nerf": optax.adam(lr), "frozen": optax.set_to_zero()}, label(params))


def create_train_state(model, rng, example_batch, lr: float = 1e-4) -> TrainState:
    from diner_tpu.utils.jitinit import jit_init

    variables = jit_init(model.init)(rng, example_batch, jax.random.PRNGKey(0))
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    tx = make_optimizer(params, lr)
    return TrainState(step=0, params=params, batch_stats=batch_stats,
                      opt_state=tx.init(params), tx=tx)
