from atmonr_tpu.pipelines.factory import get_pipeline

__all__ = ["get_pipeline"]
