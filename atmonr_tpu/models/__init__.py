from atmonr_tpu.models import encoders, hash_grid, mlp

__all__ = ["encoders", "hash_grid", "mlp"]
