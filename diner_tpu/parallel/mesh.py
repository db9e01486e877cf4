"""Device mesh + sharding utilities: the TPU-native replacement for DDP/NCCL.

Behavioral reference: the reference's distribution layer is Lightning
`strategy: ddp` / torch.distributed NCCL all-reduce (SURVEY.md §2.8, §5.8).
Here: a `jax.sharding.Mesh` with a `data` axis (optionally a second `ray`
axis); batches are sharded over `data` via NamedSharding, parameters are
replicated, and XLA inserts the gradient all-reduce over ICI automatically
when the jitted train step consumes sharded batches with replicated params —
no hand-written collectives, no process groups.

Multi-host: call `jax.distributed.initialize()` once per host before building
the mesh; `process_local_slice` replaces DistributedSampler (each host feeds
only its addressable shard).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Tuple[int, ...]] = None,
              axis_names: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build a device mesh. Default: all devices on one `data` axis."""
    devices = jax.devices() if devices is None else devices
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def make_data_mesh_for_batch(batch_size: int, devices=None) -> Mesh:
    """Data mesh using the largest device count that divides `batch_size`.

    Multi-host: the mesh takes the SAME number of chips from every process
    (devices[:n] would grab host 0's chips first, leaving other hosts with
    no addressable mesh device — their device_put/global_batch calls then
    fail). gcd was wrong even single-host: gcd(6, 4)=2 idles a chip that a
    batch of 6 could use (largest divisor of 6 that is <= 4 is 3)."""
    devices = list(jax.devices() if devices is None else devices)
    by_proc = {}
    for d in devices:
        by_proc.setdefault(getattr(d, "process_index", 0), []).append(d)
    pc = len(by_proc)
    per_host = min(len(v) for v in by_proc.values())
    m = 1
    for cand in range(per_host, 0, -1):
        if batch_size % (cand * pc) == 0:
            m = cand
            break
    chosen = [d for proc in sorted(by_proc) for d in by_proc[proc][:m]]
    return Mesh(np.asarray(chosen), ("data",))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over `axis`."""
    return NamedSharding(mesh, P(axis))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place every array in `batch` with its leading dim sharded over `axis`."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def process_local_slice(n: int, process_index: Optional[int] = None,
                        process_count: Optional[int] = None,
                        pad_to_equal: bool = False):
    """Indices this host should load (DistributedSampler equivalent).

    pad_to_equal=True wraps indices so every host gets ceil(n/pc) of them
    (torch DistributedSampler's padding): required for TRAINING, where a
    short host would run out of batches and leave the others blocked in a
    collective. Leave False for independent per-host work (write/eval),
    where padding would just duplicate outputs."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    idx = list(range(pi, n, pc))
    if pad_to_equal and n > 0:
        target = -(-n // pc)
        pos = pi + pc * len(idx)
        while len(idx) < target:  # wrap like padded[pos] = indices[pos - n]
            idx.append(pos - n)
            pos += pc
    return idx
