from dove_tpu.data.datasets import (
    BucketSampler,
    RealSRDataset,
    RealSRImageVideoDataset,
)
from dove_tpu.data.loader import PrefetchLoader, collate

__all__ = [
    "BucketSampler",
    "RealSRDataset",
    "RealSRImageVideoDataset",
    "PrefetchLoader",
    "collate",
]
