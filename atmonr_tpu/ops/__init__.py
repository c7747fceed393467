from atmonr_tpu.ops import compositor, losses, samplers

__all__ = ["compositor", "losses", "samplers"]
