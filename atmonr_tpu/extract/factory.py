"""Extract-dataset registry (parity: reference datasets/factory.py:25-84)."""

from __future__ import annotations

from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.extract.datasets import (
    HARP2EarthCAREExtractDataset,
    HARP2ExtractDataset,
    HARP2GlobalGridExtractDataset,
    HARP2L1CExtractDataset,
    HARP2VoxelGridExtractDataset,
)

EXTRACT_DATASETS = {
    "HARP2": {
        "l1c": HARP2L1CExtractDataset,
        "voxelgrid": HARP2VoxelGridExtractDataset,
        "globalgrid": HARP2GlobalGridExtractDataset,
        "earthcare": HARP2EarthCAREExtractDataset,
    },
}


def get_extract_dataset(
    mode: str, dataset: HARP2Dataset, **kwargs
) -> HARP2ExtractDataset:
    """Build the ExtractDataset for ``mode`` over an existing Dataset."""
    data_type = dataset.config["type"]
    if data_type not in EXTRACT_DATASETS:
        raise NotImplementedError(
            f"No extract dataset registered under {data_type!r}; "
            f"known coord modes: {sorted(EXTRACT_DATASETS)}"
        )
    return EXTRACT_DATASETS[data_type][mode.lower()](dataset, **kwargs)
