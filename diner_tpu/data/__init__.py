from diner_tpu.data.contract import SAMPLE_KEYS, validate_sample, collate, to_device_batch
from diner_tpu.data.synthetic import SyntheticSphereDataset

__all__ = [
    "SAMPLE_KEYS",
    "validate_sample",
    "collate",
    "to_device_batch",
    "SyntheticSphereDataset",
]
