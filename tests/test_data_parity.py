"""Golden parity vs the reference's dataset + voxel-grid machinery.

The golden file is recorded by ``tools/gen_golden.py:gen_dataset_and_voxelgrid``:
the REFERENCE HARP2Dataset (netCDF parse, view/IRGB indexing, chunked
``get_rays`` with the iterative origin solve, NaN filtering, normalization)
and HARP2VoxelGridExtractDataset (Vincenty corner/edge marching + bilinear
DEM heights), run CPU-only on the exact synthetic granule below. These tests
assert our TPU-native data layer reproduces it end to end — the BASELINE
"voxelgrid ... extraction reproduced" gate.
"""

from pathlib import Path

import numpy as np
import pytest

from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.data.synthetic import make_synthetic_granule
from atmonr_tpu.extract.datasets import HARP2VoxelGridExtractDataset

GOLDEN = Path(__file__).parent / "golden" / "harp2_dataset.npz"

CONFIG = {
    "type": "HARP2",
    "max_abs_view_angle": 45.0,
    "ray_origin_height": 20000,
    "bands_to_keep": [0, 1, 2, 3],
    "rgb_mode": "nadir",
}


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def dataset():
    granule = make_synthetic_granule(height=12, width=8, views_per_band=2)
    return HARP2Dataset(CONFIG, granule)


def test_view_and_irgb_indexing_matches_reference(golden, dataset):
    np.testing.assert_array_equal(dataset.view_idx, golden["view_idx"])
    np.testing.assert_array_equal(dataset.irgb_idx, golden["irgb_idx"])
    # ours parses fields in f32 (device dtype), the reference reads f64
    assert dataset.max_i == pytest.approx(float(golden["max_i"]), rel=1e-6)


def test_ray_build_matches_reference(golden, dataset):
    np.testing.assert_array_equal(dataset.ray_filter, golden["ray_filter"])
    scale = float(golden["scale"])
    assert dataset.scale == pytest.approx(scale, rel=1e-4)
    np.testing.assert_allclose(
        dataset.offset, golden["offset"], rtol=0, atol=1e-3 * scale
    )
    # both origin solvers iterate to a 10 m altitude tolerance; compare in
    # meters (normalized units x scale)
    np.testing.assert_allclose(
        dataset.ray_origin_norm * scale,
        golden["ray_origin_norm"] * scale,
        rtol=0,
        atol=60.0,
    )
    np.testing.assert_allclose(
        dataset.ray_dir, golden["ray_dir"], rtol=0, atol=1e-5
    )
    np.testing.assert_allclose(
        dataset.ray_len_norm * scale,
        golden["ray_len_norm"] * scale,
        rtol=0,
        atol=60.0,
    )
    np.testing.assert_allclose(
        dataset.ray_rad, golden["ray_rad"], rtol=1e-6, atol=1e-6
    )
    np.testing.assert_array_equal(dataset.ray_irgb_idx, golden["ray_irgb_idx"])
    np.testing.assert_allclose(
        dataset.ray_alt, golden["ray_alt"], rtol=1e-6, atol=1e-3
    )


def test_voxelgrid_matches_reference(golden, dataset, tmp_path):
    from tools.gen_golden import _write_fake_dem

    dem = tmp_path / "ETOPO1_ocssw.nc"
    _write_fake_dem(dem)
    vg = HARP2VoxelGridExtractDataset(
        dataset,
        horizontal_step=5000.0,
        alt_step=2000.0,
        max_alt=10000.0,
        dem_path=dem,
    )
    np.testing.assert_array_equal(np.asarray(vg.shp), golden["vg_shp"])
    np.testing.assert_allclose(
        vg.sample_alt, golden["vg_sample_alt"], rtol=0, atol=1e-6
    )
    np.testing.assert_allclose(
        vg.height, golden["vg_height"].reshape(vg.height.shape), rtol=0, atol=0.5
    )
    # grid points in meters: Vincenty marching agrees to sub-meter
    np.testing.assert_allclose(
        vg.xyz, golden["vg_xyz"], rtol=0, atol=1.0
    )


def test_l1c_extract_matches_reference(golden, dataset, tmp_path):
    """Our L1C grid vs the reference's, both reading the same synthetic
    L1C-layout file (reference harp2_extract.py:115-186)."""
    from atmonr_tpu.data.synthetic import write_granule_l1c
    from atmonr_tpu.extract.datasets import HARP2L1CExtractDataset

    # the reference derived this name from the golden L1B's 5-token name
    l1c_path = (
        tmp_path / "HARP2_L1C" / "PACE_HARP2.20240101T000000.L1C.V2.5km.nc"
    )
    write_granule_l1c(l1c_path)
    # the loader derives the L1C name from the L1B product name; present the
    # dataset under the golden run's 5-token name
    import types

    ds_like = types.SimpleNamespace(
        granule=types.SimpleNamespace(
            product_name="PACE_HARP2.20240101T000000.L1B.V2.nc"
        ),
        config=dataset.config,
        img_shp=dataset.img_shp,
        lat=dataset.lat,
        lon=dataset.lon,
        alt=dataset.alt,
        view_idx=dataset.view_idx,
    )
    l1c = HARP2L1CExtractDataset(
        ds_like, alt_step=2000.0, max_alt=10000.0, data_root=tmp_path
    )
    np.testing.assert_array_equal(
        np.asarray(l1c.shp[:2]), golden["l1c_shp"]
    )
    np.testing.assert_allclose(
        l1c.height, golden["l1c_height"], rtol=0, atol=1e-9
    )
    np.testing.assert_allclose(l1c.xyz, golden["l1c_xyz"], rtol=0, atol=1e-3)


def test_earthcare_extract_matches_reference(golden, dataset, tmp_path):
    """Our EarthCARE track sampling vs the reference's, both reading the
    same synthetic ATL_EBD_2A file (reference harp2_extract.py:599-675)."""
    from atmonr_tpu.data.synthetic import write_synthetic_earthcare
    from atmonr_tpu.extract.datasets import HARP2EarthCAREExtractDataset

    track = tmp_path / "EarthCARE" / "synthetic_ebd.h5"
    write_synthetic_earthcare(track)
    ec = HARP2EarthCAREExtractDataset(
        dataset,
        earthcare_filename="synthetic_ebd.h5",
        earthcare_range=[5, 30],
        data_root=tmp_path,
    )
    np.testing.assert_array_equal(np.asarray(ec.shp), golden["ec_shp"])
    np.testing.assert_allclose(ec.xyz, golden["ec_xyz"], rtol=0, atol=1e-3)
