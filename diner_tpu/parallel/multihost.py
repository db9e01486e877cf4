"""Multi-host (multi-process) initialization and batch assembly.

Behavioral reference: the reference's multi-node layer is
torch.distributed.launch + NCCL init (deps/TransMVSNet/train.py:359-364,
scripts/train_TransMVSNet_dtu.sh) with DistributedSampler feeding each rank.
The JAX-native equivalent: `jax.distributed.initialize()` once per process,
ONE global mesh spanning every host's devices, each process loading only its
data slice (`process_local_slice`) and contributing it via
`jax.make_array_from_process_local_data`; XLA inserts the cross-host
collectives (ICI within a slice, DCN across) from the shardings alone.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None,
                   local_device_ids=None):
    """Initialize the JAX distributed runtime (idempotent).

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, also set by
    Cloud TPU metadata), mirroring torch.distributed.launch's env:// init.
    On CPU backends, enables gloo cross-process collectives when available.
    """
    if jax.distributed.is_initialized():
        return  # (checked without touching the backend — jax.process_count()
        # would initialize XLA and break initialize())
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if not coordinator and num_processes in (None, 1):
        return  # single-process run; nothing to do
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # non-CPU backends / older configs
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def global_batch(batch, mesh: Mesh, axis: str = "data"):
    """Assemble a GLOBAL batch-sharded array tree from per-process local
    batches (the DistributedSampler hand-off): every process passes only its
    local rows; the result is one jax.Array sharded over `axis` across all
    hosts. Single-process: equivalent to shard_batch."""
    sharding = NamedSharding(mesh, P(axis))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch)
