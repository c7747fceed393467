from atmonr_tpu.geo import spherical, wgs84

__all__ = ["wgs84", "spherical"]
