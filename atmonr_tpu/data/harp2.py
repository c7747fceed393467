"""HARP2 dataset: granule -> HBM-resident ray arrays for training.

TPU-native counterpart of reference ``datasets/harp2.py:26-429``, redesigned
as host precompute (numpy float64, meter-accurate, runs once) + a device-side
ray pytree that stays resident in HBM for the whole run (mirroring the
reference's all-on-GPU residency). Per-batch iteration is a jitted gather —
see ``atmonr_tpu.data.batching``; multi-host sharding of the ray axis lives
in ``atmonr_tpu.parallel``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from atmonr_tpu.data.granule import GranuleArrays, get_indexes, parse_field
from atmonr_tpu.geo import wgs84

RAY_CHUNK = int(1e4)


@dataclass(frozen=True)
class SceneTransform:
    """Static scene normalization: ECEF <-> normalized scene coordinates and
    the "horizontal" point preprocessor (normalized lat/lon/alt).

    All fields are Python scalars, so the transform is closure-captured as
    compile-time constants inside jitted train steps. Parity: reference
    datasets/harp2.py:351-390 (including the dateline longitude shift).
    """

    scale: float
    offset: tuple[float, float, float]
    lat_min: float
    lat_range: float
    lon_min: float
    lon_range: float
    ray_origin_height: float
    shift_lon: bool

    def preprocess_points(self, pts: jax.Array) -> jax.Array:
        """Normalized-scene Cartesian -> normalized (lat, lon, alt) in [-1,1].

        Runs in the input dtype: f32 in the training hot loop (the reference
        upcasts to f64 on GPU; on TPU the f32 formulation's ~1-6 m altitude
        error floor is ~3e-4 of the 20 km normalization — see
        ``geo.wgs84.cartesian_to_horizontal``).
        """
        dtype = pts.dtype
        offset = jnp.asarray(self.offset, dtype=dtype)
        xyz = pts * self.scale + offset
        lat, lon, alt = wgs84.cartesian_to_horizontal(
            xyz[..., 0], xyz[..., 1], xyz[..., 2], xp=jnp
        )
        if self.shift_lon:
            lon = lon % 360.0 - 180.0
        lat = 2.0 * (lat - self.lat_min) / self.lat_range - 1.0
        lon = 2.0 * (lon - self.lon_min) / self.lon_range - 1.0
        alt = 2.0 * alt / self.ray_origin_height - 1.0
        coords = jnp.stack([lat, lon, alt], axis=-1).astype(dtype)
        return jnp.clip(coords, -1.0, 1.0)


class HARP2Dataset:
    """Loads a HARP2 granule and builds the normalized ray set.

    Host-side numpy float64 throughout construction (geolocation accuracy),
    then ``rays()`` materializes the training arrays on device. Field parity
    with reference ``HARP2Dataset``: ``scale``, ``offset``, ``max_i``,
    ``img_shp``, ``view_idx``, ``irgb_idx``, ``best_rgb_idx``.
    """

    def __init__(
        self,
        config: dict,
        granule: GranuleArrays,
        chunk_size: int = RAY_CHUNK,
        ray_builder: Callable | None = None,
    ) -> None:
        self.config = dict(config)
        self.config.setdefault("max_abs_view_angle", 90.0)
        self.config.setdefault("rgb_mode", "nadir")  # nerf.json omits it
        self.granule = granule

        self.view_idx, self.irgb_idx = get_indexes(
            granule,
            self.config["max_abs_view_angle"],
            self.config.get("bands_to_keep"),
        )
        level = granule.level
        self.img_shp = (
            granule.i.shape[1:] if level == "L1B" else granule.i.shape[:2]
        )

        pf = lambda a: parse_field(a, level, self.view_idx)  # noqa: E731
        self.lat = pf(granule.lat)
        self.lon = pf(granule.lon)
        self.alt = pf(granule.alt)
        self.thetav = pf(granule.thetav)
        self.phiv = pf(granule.phiv)
        self.int_arr = pf(granule.i)
        self.max_i = float(np.nanmax(self.int_arr))

        self._init_rgb_idxs(self.config["rgb_mode"])
        if ray_builder is None:
            # the multithreaded C++ builder when built (native/), else the
            # numpy f64 path — both solve origins to the same 10 m tolerance
            from atmonr_tpu import native

            ray_builder = (
                native.build_rays
                if native.available()
                else lambda *a, **k: wgs84.get_rays(*a, **k, xp=np)
            )
        self._init_ray_data(chunk_size, ray_builder)
        self._device_rays: dict | None = None

    # -- RGB view selection (parity: reference harp2.py:126-198) ------------

    def _init_rgb_idxs(self, mode: str = "nadir") -> None:
        angles = self.granule.view_angles[self.view_idx]
        num_valid = (~np.isnan(self.int_arr)).sum(axis=0)
        striped = np.zeros_like(num_valid, dtype=bool)
        if self.granule.level == "L1B":
            striped = num_valid < num_valid.mean()
        masks_rgb = [self.irgb_idx == i for i in range(1, 4)]
        idxs_rgb = [np.where(m)[0] for m in masks_rgb]
        angles_rgb = [angles[m] for m in masks_rgb]

        if not masks_rgb[0].any():
            best = int(np.argmin(np.abs(angles) + striped * 1000))
            self.best_rgb_idx = [best, best, best]
            return
        if not masks_rgb[1].any() or not masks_rgb[2].any():
            best = int(
                idxs_rgb[0][
                    np.argmin(np.abs(angles_rgb[0]) + striped[masks_rgb[0]] * 1000)
                ]
            )
            self.best_rgb_idx = [best, best, best]
            return

        angles_mg = np.stack(np.meshgrid(*angles_rgb, indexing="ij"))
        angle_ranges = angles_mg.max(axis=0) - angles_mg.min(axis=0)
        idx_nearest = angle_ranges.reshape((angles_rgb[0].shape[0], -1)).argmin(
            axis=1
        )
        idx_ng = idxs_rgb[1][idx_nearest // angles_rgb[2].shape[0]]
        idx_nb = idxs_rgb[2][idx_nearest % angles_rgb[2].shape[0]]

        if mode == "nadir":
            nadir_red = int(
                np.argmin(np.abs(angles_rgb[0]) + striped[masks_rgb[0]] * 1000)
            )
            self.best_rgb_idx = [
                int(idxs_rgb[0][nadir_red]),
                int(idx_ng[nadir_red]),
                int(idx_nb[nadir_red]),
            ]
        elif mode == "most_pixels":
            maximizer = int(
                np.stack(
                    [
                        num_valid[masks_rgb[0]],
                        num_valid[idx_ng],
                        num_valid[idx_nb],
                    ]
                )
                .min(axis=0)
                .argmax(axis=0)
            )
            self.best_rgb_idx = [
                int(idxs_rgb[0][maximizer]),
                int(idx_ng[maximizer]),
                int(idx_nb[maximizer]),
            ]
        else:
            raise NotImplementedError(f"Unrecognized RGB indexing mode {mode}")

    # -- Ray construction (parity: reference harp2.py:200-257) --------------

    def _init_ray_data(self, chunk_size: int, ray_builder: Callable) -> None:
        num_rays = self.lat.shape[0] * self.lat.shape[1]
        ray_origin = np.zeros((num_rays, 3), np.float32)
        ray_dir = np.zeros((num_rays, 3), np.float32)
        ray_len = np.zeros((num_rays,), np.float32)

        total = 0
        n_rows = self.lat.shape[0]
        for ci in range(-(-n_rows // chunk_size)):
            slc = slice(ci * chunk_size, min((ci + 1) * chunk_size, n_rows))
            o, d, ln = ray_builder(
                self.lat[slc],
                self.lon[slc],
                self.alt[slc],
                self.thetav[slc],
                self.phiv[slc],
                self.config["ray_origin_height"],
            )
            n = o.shape[0]
            ray_origin[total : total + n] = o
            ray_dir[total : total + n] = d
            ray_len[total : total + n] = ln
            total += n
        ray_rad = self.int_arr.flatten()

        self.ray_filter = np.asarray(
            wgs84.filter_rays(ray_origin, ray_dir, ray_rad, xp=np)
        )
        ray_origin = ray_origin[self.ray_filter]
        ray_dir = ray_dir[self.ray_filter]
        self.ray_rad = ray_rad[self.ray_filter]
        self.ray_len = ray_len[self.ray_filter]
        self.ray_alt = self.alt.flatten()[self.ray_filter]
        self.ray_origin = ray_origin
        self.ray_dir = ray_dir
        origin_norm, self.scale, offset = wgs84.normalize_rays(
            ray_origin, ray_dir, self.ray_len, xp=np
        )
        self.ray_origin_norm = origin_norm
        self.offset = np.asarray(offset, np.float64)
        self.ray_len_norm = (self.ray_len / self.scale).astype(np.float32)
        nv = self.view_idx.shape[0]
        self.ray_irgb_idx = self.irgb_idx[
            np.where(self.ray_filter.reshape((-1, nv)))[1]
        ].astype(np.int32)
        self.num_rays = int(self.ray_origin_norm.shape[0])

        # scene transform for the "horizontal" preprocessor
        non_nan_lat = self.lat[~np.isnan(self.lat)]
        non_nan_lon = self.lon[~np.isnan(self.lon)]
        lat_min, lat_max = float(non_nan_lat.min()), float(non_nan_lat.max())
        lon_min, lon_max = float(non_nan_lon.min()), float(non_nan_lon.max())
        shift_lon = lon_max > 179 and lon_min < -179
        if shift_lon:
            shifted = non_nan_lon % 360 - 180
            lon_min, lon_max = float(shifted.min()), float(shifted.max())
        self.scene_transform = SceneTransform(
            scale=self.scale,
            offset=tuple(float(v) for v in self.offset),
            lat_min=lat_min,
            lat_range=lat_max - lat_min,
            lon_min=lon_min,
            lon_range=lon_max - lon_min,
            ray_origin_height=float(self.config["ray_origin_height"]),
            shift_lon=shift_lon,
        )

    # -- Device arrays -------------------------------------------------------

    def host_rays(self) -> dict[str, np.ndarray]:
        """The ray set as host numpy arrays (the training pytree layout)."""
        return {
            "origin": self.ray_origin_norm,
            "dir": self.ray_dir,
            "alt": self.ray_alt,
            "rad": self.ray_rad,
            "len": self.ray_len_norm,
            "irgb_idx": self.ray_irgb_idx,
        }

    def rays(self, sharding=None) -> dict[str, jax.Array]:
        """Device-resident ray pytree, optionally sharded on the ray axis.

        All arrays stay in HBM for the run (the reference's all-on-GPU
        residency, harp2.py:119-124); batches are jitted gathers.
        """
        if self._device_rays is None or sharding is not None:
            host = self.host_rays()
            if sharding is not None:
                self._device_rays = {
                    k: jax.device_put(v, sharding) for k, v in host.items()
                }
            else:
                self._device_rays = {k: jnp.asarray(v) for k, v in host.items()}
        return self._device_rays

    def get_point_preprocessor(self, kind: str):
        """Preprocessor factory (parity: reference harp2.py:351-390)."""
        if kind == "horizontal":
            return self.scene_transform.preprocess_points
        raise NotImplementedError(kind)

    # -- Imaging helpers -----------------------------------------------------

    def target_image(self) -> np.ndarray:
        """(H, W, V) radiance image with invalid pixels zero-filled."""
        nv = self.view_idx.shape[0]
        img = np.zeros((self.img_shp[0] * self.img_shp[1] * nv), np.float32)
        img[self.ray_filter] = self.ray_rad
        return img.reshape(self.img_shp[0], self.img_shp[1], nv)

    def scatter_image(self, pixel_values: np.ndarray) -> np.ndarray:
        """(num_rays,) per-ray values -> (H, W, V) image at valid locations."""
        nv = self.view_idx.shape[0]
        img = np.zeros((self.img_shp[0] * self.img_shp[1] * nv), np.float32)
        img[self.ray_filter] = pixel_values
        return img.reshape(self.img_shp[0], self.img_shp[1], nv)

    def get_rgb(self, cube: np.ndarray) -> np.ndarray:
        """(V, H, W) image cube -> (H, W, 3) best-view RGB (harp2.py:338-349)."""
        assert cube.shape == (
            self.view_idx.shape[0],
            self.img_shp[0],
            self.img_shp[1],
        )
        img = np.clip(cube[self.best_rgb_idx] / self.max_i, 0, 1)
        return np.ascontiguousarray(img.transpose(1, 2, 0))

    def __len__(self) -> int:
        return self.num_rays
