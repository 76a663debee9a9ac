"""Data layer: TIFF IO, datasets, host batch pipeline."""

from msid_tpu.data.dataset import (
    EuroSATMultiSpectral,
    SyntheticEuroSAT,
    build_dataset,
)
from msid_tpu.data.pipeline import (
    BatchLoader,
    DeviceCachedLoader,
    get_dataloaders,
    get_test_dataloader,
)
from msid_tpu.data.tiff import read_tiff, write_tiff

__all__ = [
    "BatchLoader",
    "DeviceCachedLoader",
    "EuroSATMultiSpectral",
    "SyntheticEuroSAT",
    "build_dataset",
    "get_dataloaders",
    "get_test_dataloader",
    "read_tiff",
    "write_tiff",
]
