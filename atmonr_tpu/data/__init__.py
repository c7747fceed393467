from atmonr_tpu.data import batching, granule, harp2, synthetic

__all__ = ["batching", "granule", "harp2", "synthetic"]
