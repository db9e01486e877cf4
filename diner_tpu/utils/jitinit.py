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


def use_tpu_kernels() -> bool:
    """Whether to route hot paths through the Pallas TPU kernels.

    Auto-detects from the default backend; `DINER_TPU_KERNELS=0/1` overrides
    for mixed-backend setups (e.g. tracing a CPU program on a TPU host with
    jax.jit(..., backend='cpu'), where the default-backend heuristic would
    embed unlowerable pallas_calls, or forcing the kernels on a TPU-class
    platform with a nonstandard name).
    """
    import os

    override = os.environ.get("DINER_TPU_KERNELS")
    if override is not None:
        return override.lower() not in ("0", "false", "")
    return jax.default_backend() == "tpu"
