from .aerialpeople import AerialPeopleDataset
from .aircap import AircapDataset
from .h36m import H36MDataset
from .mixed import MixedDataset
from .pipeline import (
    Prefetcher,
    bb_encoding,
    crop_resize_pad,
    finish_batch,
    jitter_crop_boxes,
)
from .real import CopenetRealDataset
from .totalcap import TotalCaptureDataset
from .synthetic import batch_slice, make_synthetic_dataset

__all__ = [
    "H36MDataset",
    "MixedDataset",
    "TotalCaptureDataset",
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
