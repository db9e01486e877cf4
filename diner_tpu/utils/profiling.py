"""Tracing/profiling helpers.

Behavioral reference: the reference's profiling mode is
torch.autograd.profiler with a chrome-trace export
(deps/TransMVSNet/train.py:304-332, SURVEY.md §5.1). The TPU-native
equivalent: jax.profiler traces (XProf/Perfetto-compatible) plus a
block-until-ready wall-clock benchmark that defeats async-dispatch skew (the
axon tunnel pipelines one call deep, so each iteration also forces a host
readback — see .claude/skills/verify gotchas).
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in XProf/TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, warmup: int = 2, iters: int = 5):
    """Min/median wall-clock of `fn(*args)` with full device+host sync.

    Returns dict(min_s, median_s, iters).
    """
    def run():
        out = fn(*args)
        jax.block_until_ready(out)
        # force a host readback: async queues (and the axon remote tunnel)
        # can otherwise report the previous iteration's completion
        leaf = jax.tree_util.tree_leaves(out)[0]
        np.asarray(leaf.ravel()[0] if hasattr(leaf, "ravel") else leaf)
        return out

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return {"min_s": min(times), "median_s": sorted(times)[len(times) // 2],
            "iters": iters}


def setup_compilation_cache():
    """Enable the repo-local persistent compilation cache for TPU runs.

    Shared by every entry point (bench, graft entry, train CLI): full render/
    train programs take minutes to compile through a remote-compile tunnel;
    the cache makes repeat invocations start in seconds. CPU AOT artifacts
    are machine-feature sensitive (SIGILL risk across toolchain flags), so
    the cache is TPU-only.
    """
    import os
    from pathlib import Path

    # enable only when the env names a TPU-class platform: the cache must
    # never be populated with host-CPU executables (any spelling/combination)
    platforms = os.environ.get("JAX_PLATFORMS", "").lower()
    if not any(p in platforms for p in ("tpu", "axon")):
        return
    repo_root = Path(__file__).resolve().parents[2]
    jax.config.update("jax_compilation_cache_dir", str(repo_root / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
