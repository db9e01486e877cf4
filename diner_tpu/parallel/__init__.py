from diner_tpu.parallel.mesh import (
    make_mesh,
    make_data_mesh_for_batch,
    shard_batch,
    replicate,
    batch_sharding,
    process_local_slice,
)
from diner_tpu.parallel.multihost import init_multihost, global_batch

__all__ = [
    "make_mesh",
    "make_data_mesh_for_batch",
    "shard_batch",
    "replicate",
    "batch_sharding",
    "process_local_slice",
    "init_multihost",
    "global_batch",
]
