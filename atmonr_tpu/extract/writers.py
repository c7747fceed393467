"""Extraction output writers: netCDF-4 (via h5py) and OpenVDB (with .npy
fallback).

Counterpart of reference ``harp2_extract.py:429-596`` (local-grid netCDF),
``:676-791`` (EarthCARE netCDF), and ``:905-946`` (global-grid VDB). netCDF-4
files are written as HDF5 with netCDF dimension scales so standard netCDF
tooling can read them; OpenVDB remains an optional host-side C++ dependency
(I/O only — never TPU work), with the same .npy fallback as the reference.
"""

from __future__ import annotations

import warnings
from pathlib import Path

import numpy as np

FILL = np.float32(-32767.0)


def _nc_file(path: Path):
    import h5py

    f = h5py.File(path, "w")
    # netCDF-4 signature attribute so readers treat this as netCDF
    f.attrs["Conventions"] = "CF-1.8"
    return f


def _dim(f, name: str, size: int):
    d = f.create_dataset(name, data=np.arange(size, dtype=np.float64))
    d.make_scale(name)
    return d


def _var(f, name, dtype, dims, fill_value=FILL):
    shape = tuple(d.shape[0] for d in dims)
    v = f.create_dataset(name, shape=shape, dtype=dtype, fillvalue=fill_value)
    for i, d in enumerate(dims):
        v.dims[i].attach_scale(d)
    v.attrs["_FillValue"] = np.asarray(fill_value, dtype)
    return v


def extract_to_netcdf(output_filepath: Path, extract_dataset, sigma) -> None:
    """Write an L1C or voxelgrid extract to netCDF (reference
    harp2_extract.py:429-596)."""
    output_filepath = Path(output_filepath)
    assert output_filepath.suffix == ".nc"
    ds = extract_dataset.dataset
    sigma = np.asarray(sigma)
    num_bands = sigma.shape[-1]
    shp = extract_dataset.shp
    na = extract_dataset.sample_alt.shape[0]
    sigma = sigma.reshape(shp[0], shp[1], na, num_bands)

    f = _nc_file(output_filepath)
    try:
        f.attrs["title"] = "PACE HARP2 Neural Rendering Volumetric Data"
        f.attrs["input_l1b_product_name"] = ds.granule.product_name
        f.attrs["neural_rendering_scene_scale"] = ds.scale
        f.attrs["neural_rendering_scene_offset_x"] = float(ds.offset[0])
        f.attrs["neural_rendering_scene_offset_y"] = float(ds.offset[1])
        f.attrs["neural_rendering_scene_offset_z"] = float(ds.offset[2])

        d_along = _dim(f, "bins_along_track", shp[0])
        d_across = _dim(f, "bins_across_track", shp[1])
        d_vert = _dim(f, "bins_vertical", na)
        d_bands = _dim(f, "number_of_bands", num_bands)

        lat = _var(f, "latitude", np.float32, (d_along, d_across))
        lat.attrs.update(
            long_name="Latitude of bin locations",
            units="degrees_north",
            valid_min=-90.0,
            valid_max=90.0,
        )
        lat[:] = extract_dataset.lat[..., 0]
        lon = _var(f, "longitude", np.float32, (d_along, d_across))
        lon.attrs.update(
            long_name="Longitude of bin locations",
            units="degrees_east",
            valid_min=-180.0,
            valid_max=180.0,
        )
        lon[:] = extract_dataset.lon[..., 0]
        height = _var(f, "height", np.float32, (d_along, d_across))
        height.attrs.update(
            long_name="Altitude at bin locations",
            units="meters",
            valid_min=-1000.0,
            valid_max=10000.0,
        )
        height[:] = extract_dataset.height

        alt = _var(f, "altitude", np.float32, (d_vert,))
        alt.attrs.update(units="meters", long_name="Altitude above surface")
        alt[:] = extract_dataset.sample_alt

        nc_sigma = _var(
            f,
            "extinction_coefficient",
            np.float32,
            (d_along, d_across, d_vert, d_bands),
        )
        nc_sigma.attrs.update(
            units="m^-1", long_name="Extinction coefficient", valid_min=0.0
        )
        nc_sigma[:] = sigma

        xyz = extract_dataset.xyz.reshape(shp[0], shp[1], na, 3)
        for i, axis in enumerate("xyz"):
            v = _var(f, f"{axis}_wgs84", np.float32, (d_along, d_across, d_vert))
            v.attrs.update(
                units="meters",
                long_name=(
                    f"{axis.upper()} coordinate in WGS-84 cartesian (EPSG:4978)"
                ),
            )
            v[:] = xyz[..., i]
    finally:
        f.close()


def earthcare_to_netcdf(output_filepath: Path, extract_dataset, sigma) -> None:
    """Write an EarthCARE-coordinates extract to netCDF (reference
    harp2_extract.py:676-791)."""
    output_filepath = Path(output_filepath)
    assert output_filepath.suffix == ".nc"
    ds = extract_dataset.dataset
    sigma = np.asarray(sigma)
    num_bands = sigma.shape[-1]
    shp = extract_dataset.shp
    sigma = sigma.reshape(shp[0], shp[1], num_bands)

    f = _nc_file(output_filepath)
    try:
        f.attrs["title"] = (
            "PACE HARP2 Neural Rendering Volumetric Data in EarthCARE ATLID "
            "level 2A coordinates."
        )
        f.attrs["input_l1b_product_name"] = ds.granule.product_name
        f.attrs["neural_rendering_scene_scale"] = ds.scale
        f.attrs["neural_rendering_scene_offset_x"] = float(ds.offset[0])
        f.attrs["neural_rendering_scene_offset_y"] = float(ds.offset[1])
        f.attrs["neural_rendering_scene_offset_z"] = float(ds.offset[2])
        if isinstance(extract_dataset.earthcare_range, list):
            f.attrs["earthcare_start_idx"] = extract_dataset.earthcare_range[0]
            f.attrs["earthcare_end_idx"] = extract_dataset.earthcare_range[1]
        f.attrs["ray_origin_height"] = ds.config["ray_origin_height"]

        d_along = _dim(f, "along_track", shp[0])
        d_height = _dim(f, "JSG_height", shp[1])
        d_bands = _dim(f, "number_of_bands", num_bands)

        lat = _var(f, "latitude", np.float64, (d_along,))
        lon = _var(f, "longitude", np.float64, (d_along,))
        height = _var(f, "height", np.float64, (d_along, d_height))
        for name, v in [("latitude", lat), ("longitude", lon), ("height", height)]:
            for attr in ["units", "long_name", "comment"]:
                if attr in extract_dataset._h5_attrs.get(name, {}):
                    v.attrs[attr] = extract_dataset._h5_attrs[name][attr]
        lat[:] = extract_dataset.lat[:, 0]
        lon[:] = extract_dataset.lon[:, 0]
        height[:] = extract_dataset.alt

        nc_sigma = _var(
            f, "extinction_coefficient", np.float32, (d_along, d_height, d_bands)
        )
        nc_sigma.attrs.update(
            units="m^-1", long_name="Extinction coefficient", valid_min=0.0
        )
        nc_sigma[:] = sigma

        xyz = extract_dataset.xyz.reshape(shp[0], shp[1], 3)
        for i, axis in enumerate("xyz"):
            v = _var(f, f"{axis}_wgs84", np.float32, (d_along, d_height))
            v.attrs.update(
                units="meters",
                long_name=(
                    f"{axis.upper()} coordinate in WGS-84 cartesian (EPSG:4978)"
                ),
            )
            v[:] = xyz[..., i]
    finally:
        f.close()


def global_grid_dump(output_filepath: Path, extract_dataset, sigma) -> None:
    """Dump a global-grid extract to OpenVDB, or voxels.npy/sigma.npy if the
    OpenVDB Python bindings are unavailable (reference harp2_extract.py:905-946).
    """
    sigma = np.asarray(sigma)
    try:
        import openvdb as vdb  # type: ignore
    except ImportError:
        try:
            import pyopenvdb as vdb  # type: ignore
        except ImportError:
            vdb = None
    if vdb is None:
        # Fallback contract: two sparse arrays derived from the REQUESTED
        # path — <stem>_voxels.npy (N, 3) int ijk and <stem>_sigma.npy (N,)
        # — so concurrent extracts never collide. (The reference instead
        # drops voxels.npy/sigma.npy in the CWD, harp2_extract.py:919-921.)
        out = Path(output_filepath)
        voxel_filepath = out.with_name(out.stem + "_voxels.npy")
        sigma_filepath = out.with_name(out.stem + "_sigma.npy")
        warnings.warn(
            "Unable to import OpenVDB Python bindings, exporting to "
            f"{voxel_filepath} and {sigma_filepath} instead."
        )
        for p in (voxel_filepath, sigma_filepath):
            if p.exists():
                warnings.warn(f"overwriting existing extract output {p}")
        np.save(voxel_filepath, extract_dataset.voxels, allow_pickle=False)
        np.save(sigma_filepath, sigma, allow_pickle=False)
        return
    output_filepath = Path(output_filepath)
    assert output_filepath.suffix == ".vdb"
    grid = vdb.FloatGrid()
    for i in range(sigma.shape[0]):
        grid.copyFromArray(
            sigma[i, None, None, None], ijk=extract_dataset.voxels[i]
        )
    grid.transform = vdb.createLinearTransform(
        voxelSize=extract_dataset.grid_res
    )
    grid.name = "density"
    grid.saveFloatAsHalf = True
    grid.vectorType = "invariant"
    vdb.write(str(output_filepath), grids=[grid])
