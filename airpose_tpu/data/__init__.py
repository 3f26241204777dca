from .aerialpeople import AerialPeopleDataset
from .aircap import AircapDataset
from .pipeline import (
    Prefetcher,
    bb_encoding,
    crop_resize_pad,
    finish_batch,
    jitter_crop_boxes,
)
from .real import CopenetRealDataset
from .synthetic import batch_slice, make_synthetic_dataset

__all__ = [
    "AerialPeopleDataset",
    "AircapDataset",
    "CopenetRealDataset",
    "Prefetcher",
    "bb_encoding",
    "crop_resize_pad",
    "finish_batch",
    "jitter_crop_boxes",
    "batch_slice",
    "make_synthetic_dataset",
]
