from atmonr_tpu.extract.factory import EXTRACT_DATASETS, get_extract_dataset
from atmonr_tpu.extract.runner import run_extraction

__all__ = ["EXTRACT_DATASETS", "get_extract_dataset", "run_extraction"]
