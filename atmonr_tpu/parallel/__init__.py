from atmonr_tpu.parallel import mesh, sharding, train

__all__ = ["mesh", "sharding", "train"]
