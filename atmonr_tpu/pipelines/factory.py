"""Pipeline registry (parity: reference pipelines/factory.py:7-27)."""

from __future__ import annotations

from atmonr_tpu.pipelines.base import Pipeline
from atmonr_tpu.pipelines.instant_ngp import InstantNGPPipeline
from atmonr_tpu.pipelines.nerf import NeRFPipeline

_PIPELINES = {
    "NeRF": NeRFPipeline,
    "InstantNGP": InstantNGPPipeline,
}


def get_pipeline(config: dict, dataset) -> Pipeline:
    """Build the pipeline named by ``config["type"]``."""
    pipeline_type = config["type"]
    if pipeline_type not in _PIPELINES:
        raise NotImplementedError(
            f"No pipeline registered under {pipeline_type!r}; "
            f"known types: {sorted(_PIPELINES)}"
        )
    return _PIPELINES[pipeline_type](config, dataset)
