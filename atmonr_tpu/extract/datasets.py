"""Extraction grids: sample-point sets for querying a trained model's
extinction field, plus their dump formats.

TPU-native counterpart of reference ``datasets/harp2_extract.py:38-946``.
All grid construction is host-side numpy float64 (meter-accurate geodesy via
``atmonr_tpu.geo``); the batched device query lives in
``atmonr_tpu.extract.runner``. Four coordinate modes, as in the reference:

- ``l1c``: horizontal grid from the matching HARP2 L1C product;
- ``voxelgrid``: near-uniform geodesic grid built with Vincenty marching,
  with DEM (ETOPO1) surface heights;
- ``globalgrid``: spherical-Earth voxel grid from ray traversal, for
  large-scale visualization (OpenVDB);
- ``earthcare``: sample points along an EarthCARE ATL_EBD_2A track.
"""

from __future__ import annotations

import warnings
from pathlib import Path

import numpy as np

from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.extract.voxel_traversal import voxel_traversal
from atmonr_tpu.extract.writers import (
    extract_to_netcdf,
    global_grid_dump,
    earthcare_to_netcdf,
)
from atmonr_tpu.geo import spherical as sph
from atmonr_tpu.geo import wgs84

_CHUNK_SIZE = int(3e4)
DEM_PATH = "data/ETOPO1_ocssw.nc"


class HARP2ExtractDataset:
    """Abstract base: holds (xyz, idx) sample points and a ``dump`` method."""

    def __init__(self, dataset: HARP2Dataset) -> None:
        if type(self) is HARP2ExtractDataset:
            raise NotImplementedError
        self.dataset = dataset
        self.shp: tuple = (0, 0)
        self.xyz = np.zeros((0, 3), np.float64)
        self.idx = np.zeros((0,), np.int32)

    def __len__(self) -> int:
        return self.xyz.shape[0]

    def dump(self, output_filepath: Path, sigma: np.ndarray) -> None:
        raise NotImplementedError


class _HARP2LocalExtractDataset(HARP2ExtractDataset):
    """Base for non-global grids: adds the altitude ladder + netCDF dump."""

    def __init__(
        self,
        dataset: HARP2Dataset,
        alt_step: float,
        min_alt: float | None = None,
        max_alt: float | None = None,
    ) -> None:
        if type(self) is _HARP2LocalExtractDataset:
            raise NotImplementedError
        super().__init__(dataset)
        self.alt_step = alt_step
        self.min_alt = 0.0 if min_alt is None else min_alt
        self.max_alt = (
            dataset.config["ray_origin_height"] if max_alt is None else max_alt
        )
        self.sample_alt = np.arange(
            self.min_alt, self.max_alt + self.alt_step / 2, self.alt_step
        )

    def _grid_from_latlon(self, lat2d: np.ndarray, lon2d: np.ndarray) -> None:
        """Expand a horizontal (H, W) lat/lon grid by the altitude ladder."""
        na = self.sample_alt.shape[0]
        self.lat = np.repeat(lat2d[:, :, None], na, axis=2)
        self.lon = np.repeat(lon2d[:, :, None], na, axis=2)
        alt = np.broadcast_to(
            self.sample_alt[None, None], self.lat.shape
        )
        x, y, z = wgs84.horizontal_to_cartesian(
            self.lat.astype(np.float64),
            self.lon.astype(np.float64),
            alt.astype(np.float64),
            xp=np,
        )
        self.xyz = np.stack([x, y, z], axis=-1).reshape(-1, 3)
        self.idx = np.arange(self.xyz.shape[0], dtype=np.int32)

    def dump(self, output_filepath: Path, sigma: np.ndarray) -> None:
        extract_to_netcdf(output_filepath, self, sigma)


class HARP2L1CExtractDataset(_HARP2LocalExtractDataset):
    """Horizontal grid from the matching L1C product (reference
    harp2_extract.py:115-186). The L1C lat/lon define the horizontal spacing;
    the vertical ladder is user-defined. For synthetic scenes with no L1C
    product on disk, a pseudo-L1C grid is derived from the granule's per-pixel
    mean geolocation (documented offline fallback).
    """

    def __init__(
        self,
        dataset: HARP2Dataset,
        alt_step: float,
        min_alt: float | None = None,
        max_alt: float | None = None,
        data_root: str | Path = "data",
        **_: object,
    ) -> None:
        super().__init__(dataset, alt_step, min_alt, max_alt)

        l1c = self._load_l1c(dataset, Path(data_root))
        if l1c is not None:
            lat2d, lon2d, height = l1c
        else:
            # offline fallback: per-pixel mean of the granule's view geoloc
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", RuntimeWarning)
                lat2d = np.nanmean(
                    dataset.lat.reshape(
                        dataset.img_shp[0], dataset.img_shp[1], -1
                    ),
                    axis=-1,
                )
                lon2d = np.nanmean(
                    dataset.lon.reshape(
                        dataset.img_shp[0], dataset.img_shp[1], -1
                    ),
                    axis=-1,
                )
                height = np.nanmean(
                    dataset.alt.reshape(
                        dataset.img_shp[0], dataset.img_shp[1], -1
                    ),
                    axis=-1,
                )
        self.height = np.nan_to_num(height)
        lat2d = np.nan_to_num(lat2d)
        lon2d = np.nan_to_num(lon2d)
        self.shp = (lat2d.shape[0], lat2d.shape[1], self.sample_alt.shape[0])
        self._grid_from_latlon(lat2d, lon2d)

    @staticmethod
    def _load_l1c(dataset: HARP2Dataset, data_root: Path):
        """Find + read the L1C product matching the loaded L1B granule."""
        name = dataset.granule.product_name
        parts = name.split(".")
        if len(parts) < 4 or "SYNTHETIC" in name:
            return None
        sensor, timestamp, _, version = parts[:4]
        l1c_name = f"{sensor}.{timestamp}.L1C.{version}.5km.nc"
        path = data_root / "HARP2_L1C" / l1c_name
        if not path.exists():
            from atmonr_tpu.data.factory import download

            download(l1c_name, path.parent, "L1C")
        import h5py

        with h5py.File(path, "r") as f:
            def rd(k):
                arr = np.asarray(f[f"geolocation_data/{k}"][...], np.float64)
                fill = f[f"geolocation_data/{k}"].attrs.get("_FillValue")
                if fill is not None:
                    arr[arr == np.asarray(fill).ravel()[0]] = np.nan
                return np.ascontiguousarray(arr[::-1])  # North up

            return rd("latitude"), rd("longitude"), rd("height")


def _wrap_lon(lon):
    """Wrap longitudes into [-180, 180)."""
    return (lon + 180.0) % 360.0 - 180.0


def swath_corner_latlons(lat_img: np.ndarray, lon_img: np.ndarray) -> np.ndarray:
    """Bounding (lat, lon) corners of a multi-view granule swath.

    ``lat_img``/``lon_img`` are (H, W, views). The swath must be north-up
    (latitude decreasing along axis 0) and west-to-east (longitude increasing
    along axis 1), and every image corner must have at least one valid view —
    all asserted here, mirroring the reference's assumptions
    (harp2_extract.py:223-246). Longitude extrema are taken in a
    swath-mean-centred frame so a swath straddling the antimeridian still
    orders west/east consistently, then unshifted and wrapped.

    Returns a (4, 2) float64 array of (lat, lon) rows ordered NW, NE, SW, SE.
    """
    assert np.nanmean(lat_img[-1, 0] - lat_img[0, 0]) < 0
    eastward = np.nanmean(lon_img[0, -1] - lon_img[0, 0]) % 360.0
    assert 0.0 < eastward < 180.0

    centre = np.nanmean(lon_img)
    rel_lon = lon_img - centre

    # per corner: (row, col, latitude reducer, relative-longitude reducer) —
    # north rows keep the largest latitude across views, west columns the
    # smallest relative longitude, and so on
    corner_spec = [
        (0, 0, np.nanmax, np.nanmin),  # NW
        (0, -1, np.nanmax, np.nanmax),  # NE
        (-1, 0, np.nanmin, np.nanmin),  # SW
        (-1, -1, np.nanmin, np.nanmax),  # SE
    ]
    corners = np.empty((4, 2), np.float64)
    for k, (r, c, reduce_lat, reduce_lon) in enumerate(corner_spec):
        assert not np.isnan(lat_img[r, c]).all()
        assert not np.isnan(lon_img[r, c]).all()
        corners[k, 0] = reduce_lat(lat_img[r, c])
        corners[k, 1] = _wrap_lon(reduce_lon(rel_lon[r, c]) + centre)
    return corners


def _centred_fractions(span: float, step: float) -> np.ndarray:
    """Fractions in (0, 1) placing ``int(span // step)`` points ``step``
    apart, with half the remainder left as margin at each end."""
    count = int(span // step)
    margin = span % step
    return (np.linspace(0.0, span - margin, count) + margin / 2.0) / span


def geodesic_grid(corners: np.ndarray, step: float):
    """Near-uniform (lat, lon) grid over a quadrilateral swath.

    Earth curvature would make a plain lat/lon lattice unevenly spaced, so
    the grid is laid out with Vincenty geodesics instead (reference
    harp2_extract.py:273-327, rebuilt here around batched solves): the grid
    shape comes from the two midline spans (west-edge-midpoint to
    east-edge-midpoint, north to south), row anchors are marched along the
    north and south edges, and each grid column is filled in by walking the
    geodesic between its pair of anchors.

    Args:
        corners: (4, 2) array of (lat, lon) rows ordered NW, NE, SW, SE.
        step: target spacing between neighbouring grid points, in meters.

    Returns:
        ``(lat, lon)`` float64 arrays, each (rows, cols).
    """
    # one batched inverse solve for the four edges: N, S, W, E
    edge_start = corners[[0, 2, 0, 1]].T  # (2, 4)
    edge_end = corners[[1, 3, 2, 3]].T
    edge_len, edge_azi, _ = wgs84.vincenty_distance(edge_start, edge_end, xp=np)
    # one batched direct solve for all four edge midpoints
    mids, _ = wgs84.vincenty_point_along_geodesic(
        edge_start, edge_azi, edge_len / 2.0, xp=np
    )  # (2, 4)
    # midline spans: rows axis = N-mid to S-mid, cols axis = W-mid to E-mid
    span_rows_cols, _, _ = wgs84.vincenty_distance(
        mids[:, [0, 2]], mids[:, [1, 3]], xp=np
    )
    frac_rows = _centred_fractions(float(span_rows_cols[0]), step)
    frac_cols = _centred_fractions(float(span_rows_cols[1]), step)

    # anchor each column on the north and south edges (both marched from
    # their western corner at the edge's forward azimuth)
    anchors, _ = wgs84.vincenty_point_along_geodesic(
        corners[[0, 2]].T[:, :, None],  # (2, 2, 1): NW and SW starts
        edge_azi[:2, None],
        frac_cols[None, :] * edge_len[:2, None],
        xp=np,
    )  # (2, 2, ncols): (lat|lon, N|S edge, col)
    north_anchor, south_anchor = anchors[:, 0], anchors[:, 1]

    # fill each column by walking its anchor-to-anchor geodesic
    col_len, col_azi, _ = wgs84.vincenty_distance(
        north_anchor, south_anchor, xp=np
    )  # each (ncols,)
    grid, _ = wgs84.vincenty_point_along_geodesic(
        north_anchor[:, None, :],
        col_azi[None, :],
        frac_rows[:, None] * col_len[None, :],
        xp=np,
    )  # (2, nrows, ncols)
    return grid[0], grid[1]


class HARP2VoxelGridExtractDataset(_HARP2LocalExtractDataset):
    """User-defined voxel grid with near-uniform horizontal spacing despite
    Earth curvature, built by Vincenty geodesic marching (reference
    harp2_extract.py:189-348), plus bilinear DEM surface heights.
    """

    def __init__(
        self,
        dataset: HARP2Dataset,
        horizontal_step: float,
        alt_step: float,
        min_alt: float | None = None,
        max_alt: float | None = None,
        dem_path: str | Path = DEM_PATH,
        **_: object,
    ) -> None:
        super().__init__(dataset, alt_step, min_alt, max_alt)
        self.horizontal_step = horizontal_step

        nv = dataset.view_idx.shape[0]
        img_shape = list(dataset.img_shp) + [nv]
        corners = swath_corner_latlons(
            dataset.lat.reshape(img_shape).astype(np.float64),
            dataset.lon.reshape(img_shape).astype(np.float64),
        )
        sample_lat, sample_lon = geodesic_grid(corners, horizontal_step)

        self.height = interp_dem_height(dem_path, sample_lat, sample_lon)
        self.shp = sample_lat.shape + (self.sample_alt.shape[0],)
        self._grid_from_latlon(sample_lat, sample_lon)


def interp_dem_height(
    dem_path: str | Path, sample_lat: np.ndarray, sample_lon: np.ndarray
) -> np.ndarray:
    """Bilinear interpolation of the ETOPO1 DEM at the given coordinates.

    Reads only the covering sub-window of the DEM (reference
    harp2_extract.py:350-426); missing DEM -> zero heights with a warning
    (offline environments).
    """
    dem_path = Path(dem_path)
    if not dem_path.exists():
        warnings.warn(
            f"DEM {dem_path} not found; using zero surface heights."
        )
        return np.zeros_like(sample_lat)
    import h5py

    with h5py.File(dem_path, "r") as f:
        def attr(name):
            return float(np.asarray(f.attrs[name]).ravel()[0])

        upper_lat = attr("upper_lat")
        left_lon = attr("left_lon")
        lat_res = attr("geospatial_lat_resolution")
        lon_res = attr("geospatial_lon_resolution")
        n_lat, n_lon = f["height"].shape

        loc_lat = (upper_lat - sample_lat) / lat_res
        loc_lon = (sample_lon - left_lon) / lon_res
        idx_lat = np.clip((loc_lat // 1).astype(int), 0, n_lat - 2).flatten()
        idx_lon = np.clip((loc_lon // 1).astype(int), 0, n_lon - 2).flatten()
        rem_lat = (loc_lat % 1).flatten()
        rem_lon = (loc_lon % 1).flatten()

        la0, la1 = idx_lat.min(), idx_lat.max() + 2
        lo0, lo1 = idx_lon.min(), idx_lon.max() + 2
        height = np.asarray(f["height"][la0:la1, lo0:lo1], np.float64)
        if "water_surface_height" in f:
            wsh = np.asarray(
                f["water_surface_height"][la0:la1, lo0:lo1], np.float64
            )
            height = np.maximum(height, wsh)
        idx_lat, idx_lon = idx_lat - la0, idx_lon - lo0

    corners = np.stack(
        [
            height[idx_lat, idx_lon],
            height[idx_lat, idx_lon + 1],
            height[idx_lat + 1, idx_lon],
            height[idx_lat + 1, idx_lon + 1],
        ]
    )
    weights = np.stack(
        [
            (1 - rem_lat) * (1 - rem_lon),
            (1 - rem_lat) * rem_lon,
            rem_lat * (1 - rem_lon),
            rem_lat * rem_lon,
        ]
    )
    interp = (corners * weights).sum(axis=0).reshape(sample_lat.shape)
    return np.clip(interp, 0, None)


class HARP2GlobalGridExtractDataset(HARP2ExtractDataset):
    """Spherical-Earth global voxel grid for large-scale visualization
    (reference harp2_extract.py:794-946): rays -> sphere coords, vertical
    stretch, chunked voxel traversal, per-layer longitude crop, unstretch +
    cull.

    No reference golden exists for this mode because the reference's cull
    line (harp2_extract.py:891, ``alt <= 0 + alt > ray_origin_height``)
    parses as a chained tensor comparison and raises at runtime — a latent
    reference bug; the intended ``(alt <= 0) | (alt > height)`` is
    implemented here and covered by geometry unit tests instead
    (tests/test_extract.py).
    """

    def __init__(
        self,
        dataset: HARP2Dataset,
        scale: float,
        grid_res: float,
        vstretch: float | None = None,
        lon_crop: float = 0.05,
        **_: object,
    ) -> None:
        super().__init__(dataset)
        vstretch = 1.0 if vstretch is None else vstretch
        assert vstretch >= 1
        self.scale = scale
        self.grid_res = grid_res
        self.vstretch = vstretch

        ray_origin = sph.wgs_84_to_spherical(
            dataset.ray_origin.astype(np.float64), xp=np
        )
        ray_dest = (
            dataset.ray_origin
            + dataset.ray_dir * dataset.ray_len[:, None]
        ).astype(np.float64)
        ray_dest = sph.wgs_84_to_spherical(ray_dest, xp=np)

        ray_origin = sph.stretch_above_sea_level(ray_origin, vstretch, xp=np)
        ray_dest = sph.stretch_above_sea_level(ray_dest, vstretch, xp=np)

        ray_origin *= scale / grid_res
        ray_dest *= scale / grid_res

        xyz = np.zeros((0, 3), np.float64)
        n = ray_origin.shape[0]
        for i in range(n // _CHUNK_SIZE + 1):
            start = min(n, i * _CHUNK_SIZE)
            end = min(n, start + _CHUNK_SIZE)
            if start == end:
                continue
            vox = voxel_traversal(
                ray_origin[start:end], ray_dest[start:end], unique_only=False
            )
            xyz = np.unique(np.concatenate([xyz, vox], axis=0), axis=0)

        # voxel index -> voxel centers in spherical-scaled coordinates
        xyz = (xyz.astype(np.float64) + 0.5) * (grid_res / scale)

        # crop extreme longitudes per z-layer
        z_uq = np.unique(xyz[:, 2])
        lon_sph = np.arctan2(xyz[:, 1], xyz[:, 0])
        keep = []
        for z in z_uq:
            layer = xyz[:, 2] == z
            lon_layer = lon_sph[layer]
            rng = lon_layer.max() - lon_layer.min()
            lo = lon_layer.min() + lon_crop * rng
            hi = lon_layer.max() - lon_crop * rng
            keep.append(xyz[layer][(lon_layer > lo) & (lon_layer < hi)])
        xyz = np.concatenate(keep, axis=0)
        self.voxels = (xyz * (scale / grid_res)).astype(np.int32)

        xyz = sph.stretch_above_sea_level(xyz, 1.0 / vstretch, xp=np)
        xyz = sph.spherical_to_wgs84(xyz, xp=np)
        _, _, alt = wgs84.cartesian_to_horizontal(
            xyz[:, 0], xyz[:, 1], xyz[:, 2], xp=np
        )
        cull = (alt <= 0) | (alt > dataset.config["ray_origin_height"])
        self.xyz = xyz[~cull]
        self.voxels = self.voxels[~cull]
        self.idx = np.arange(self.xyz.shape[0], dtype=np.int32)
        self.shp = (self.xyz.shape[0],)

    def dump(self, output_filepath: Path, sigma: np.ndarray) -> None:
        global_grid_dump(output_filepath, self, sigma)


class HARP2EarthCAREExtractDataset(HARP2ExtractDataset):
    """Sample points from an EarthCARE ATL_EBD_2A track for validation
    matchups (reference harp2_extract.py:599-791)."""

    def __init__(
        self,
        dataset: HARP2Dataset,
        earthcare_filename: str,
        earthcare_range: list[int] | None = None,
        data_root: str | Path = "data",
        **_: object,
    ) -> None:
        super().__init__(dataset)
        assert earthcare_range is None or (
            len(earthcare_range) == 2
            and earthcare_range[1] > earthcare_range[0]
        )
        self.earthcare_filename = earthcare_filename
        self.earthcare_range = earthcare_range

        import h5py

        path = Path(data_root) / "EarthCARE" / earthcare_filename
        self._h5_attrs = {}
        with h5py.File(path, "r") as f:
            file_type = f["HeaderData/FixedProductHeader/File_Type"][()]
            if isinstance(file_type, bytes):
                file_type = file_type.decode()
            if file_type != "ATL_EBD_2A":
                raise NotImplementedError(
                    "Extraction currently only supports ATL_EBD_2A, not "
                    f"'{file_type}'."
                )
            self.alt = np.asarray(f["ScienceData/height"][:], np.float64)
            lat_1d = np.asarray(f["ScienceData/latitude"][:], np.float64)
            lon_1d = np.asarray(f["ScienceData/longitude"][:], np.float64)
            for key in ["latitude", "longitude", "height"]:
                ds = f[f"ScienceData/{key}"]
                self._h5_attrs[key] = {
                    k: (v.decode() if isinstance(v, bytes) else v)
                    for k, v in ds.attrs.items()
                }
        self.lat = np.repeat(lat_1d[:, None], self.alt.shape[1], axis=1)
        self.lon = np.repeat(lon_1d[:, None], self.alt.shape[1], axis=1)

        if earthcare_range is not None:
            slc = slice(*earthcare_range)
            self.lat = self.lat[slc]
            self.lon = self.lon[slc]
            self.alt = self.alt[slc]

        mask_alt = (self.alt > 0).all(axis=0) & (
            self.alt < dataset.config["ray_origin_height"]
        ).all(axis=0)
        self.lat = self.lat[:, mask_alt]
        self.lon = self.lon[:, mask_alt]
        self.alt = self.alt[:, mask_alt]
        self.shp = self.lat.shape

        x, y, z = wgs84.horizontal_to_cartesian(
            self.lat.flatten(), self.lon.flatten(), self.alt.flatten(), xp=np
        )
        self.xyz = np.stack([x, y, z], axis=1)
        self.idx = np.arange(self.xyz.shape[0], dtype=np.int32)

    def dump(self, output_filepath: Path, sigma: np.ndarray) -> None:
        earthcare_to_netcdf(output_filepath, self, sigma)
