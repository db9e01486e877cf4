from diner_tpu.fusion.consistency import (
    reproject_with_depth,
    check_geometric_consistency,
    filter_depths,
)
from diner_tpu.fusion.consensus import consensus_fusion
from diner_tpu.fusion.ply import write_ply, read_ply

__all__ = [
    "reproject_with_depth",
    "check_geometric_consistency",
    "filter_depths",
    "consensus_fusion",
    "write_ply",
    "read_ply",
]
