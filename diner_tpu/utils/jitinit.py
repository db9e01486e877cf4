"""Backend-aware model initialization.

Eager flax `init` dispatches the model op-by-op — fine on local CPU, but
each primitive is a round trip through a remote-TPU tunnel (observed:
minutes for the flagship model). On TPU we jit the init into one program;
on CPU we keep it eager (jit would only add a throwaway compile, e.g. in
the unit-test suite).
"""

from __future__ import annotations

import jax


def jit_init(init_fn):
    """Wrap a flax `Module.init` (or partial of it) for the active backend."""
    if jax.default_backend() == "tpu":
        return jax.jit(init_fn)
    return init_fn
