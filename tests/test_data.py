"""Tests for the data layer: synthetic granule, HARP2 dataset, batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atmonr_tpu.data import batching
from atmonr_tpu.data.granule import get_indexes, read_granule
from atmonr_tpu.data.harp2 import HARP2Dataset
from atmonr_tpu.data.synthetic import make_synthetic_granule, write_granule_l1b
from atmonr_tpu.geo import wgs84

CONFIG = {
    "type": "HARP2",
    "max_abs_view_angle": 45.0,
    "ray_origin_height": 20000,
    "bands_to_keep": [0, 1, 2, 3],
    "rgb_mode": "nadir",
}


@pytest.fixture(scope="module")
def granule():
    return make_synthetic_granule(height=12, width=8, views_per_band=2)


@pytest.fixture(scope="module")
def dataset(granule):
    return HARP2Dataset(CONFIG, granule)


def test_get_indexes_irgb_order(granule):
    view_idx, irgb_idx = get_indexes(granule, 90.0)
    # sorted by decreasing wavelength: IR first, then R, G, B
    assert (np.diff(granule.wavelengths[view_idx]) <= 0).all()
    assert (np.sort(irgb_idx) == irgb_idx).all()
    assert set(irgb_idx.tolist()) == {0, 1, 2, 3}


def test_view_angle_filtering(granule):
    view_idx, _ = get_indexes(granule, 20.0)
    assert (np.abs(granule.view_angles[view_idx]) <= 20.0).all()


def test_dataset_ray_geometry(dataset):
    assert dataset.num_rays > 0
    # origins sit at ray_origin_height above ellipsoid
    o = dataset.ray_origin.astype(np.float64)
    _, _, alt = wgs84.cartesian_to_horizontal(o[:, 0], o[:, 1], o[:, 2], xp=np)
    assert np.max(np.abs(alt - 20000.0)) < 15.0
    # normalized origins live in [-1, 1]
    assert dataset.ray_origin_norm.min() >= -1.0
    assert dataset.ray_origin_norm.max() <= 1.0
    assert dataset.scale > 0
    # invalid radiances filtered
    assert not np.isnan(dataset.ray_rad).any()


def test_dataset_irgb_per_ray(dataset):
    assert dataset.ray_irgb_idx.shape == (dataset.num_rays,)
    assert set(np.unique(dataset.ray_irgb_idx).tolist()) <= {0, 1, 2, 3}


def test_point_preprocessor_bounds_and_altitude(dataset):
    pre = dataset.get_point_preprocessor("horizontal")
    rays = dataset.rays()
    # points along rays: origin + t*dir*len
    t = jnp.linspace(0.1, 0.9, 5)[None, :, None]
    pts = (
        rays["origin"][:16, None]
        + rays["dir"][:16, None] * t * rays["len"][:16, None, None]
    )
    coords = pre(pts)
    assert coords.shape == pts.shape
    assert float(jnp.min(coords)) >= -1.0 and float(jnp.max(coords)) <= 1.0
    # altitude channel decreases monotonically toward the surface
    alt = np.asarray(coords[..., 2])
    assert (np.diff(alt, axis=1) < 0).mean() > 0.95


def test_preprocessor_inverts_surface_points(dataset):
    """Ray end points map back to their (normalized) known lat/lon."""
    pre = dataset.get_point_preprocessor("horizontal")
    rays = dataset.rays()
    ends = rays["origin"] + rays["dir"] * rays["len"][:, None]
    coords = np.asarray(pre(ends))
    st = dataset.scene_transform
    lat = (coords[:, 0] + 1) / 2 * st.lat_range + st.lat_min
    valid_lat = dataset.lat.flatten()[dataset.ray_filter]
    assert np.nanmax(np.abs(lat - valid_lat)) < 0.01  # degrees


def test_rgb_image(dataset):
    target = dataset.target_image()
    cube = target.transpose(2, 0, 1)
    rgb = dataset.get_rgb(cube)
    assert rgb.shape == (dataset.img_shp[0], dataset.img_shp[1], 3)
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_hard_scene_granule():
    """Multi-blob scene: valid radiances with more texture than the bump."""
    easy = make_synthetic_granule(height=24, width=16, views_per_band=2)
    hard = make_synthetic_granule(
        height=24, width=16, views_per_band=2, n_blobs=40
    )
    assert hard.i.shape == easy.i.shape
    assert np.nanmin(hard.i) > 0
    # a different field than the single bump, and seed-deterministic
    assert not np.allclose(
        np.nan_to_num(hard.i), np.nan_to_num(easy.i), atol=1.0
    )
    again = make_synthetic_granule(
        height=24, width=16, views_per_band=2, n_blobs=40
    )
    np.testing.assert_array_equal(
        np.nan_to_num(hard.i), np.nan_to_num(again.i)
    )
    ds = HARP2Dataset(CONFIG, hard)
    assert ds.num_rays > 0
    assert np.isfinite(ds.ray_rad).all()


def test_granule_file_roundtrip(tmp_path, granule):
    path = tmp_path / "synthetic_l1b.nc"
    write_granule_l1b(granule, path)
    g2 = read_granule(path)
    assert g2.level == "L1B"
    np.testing.assert_allclose(g2.lat, granule.lat, rtol=1e-12)
    np.testing.assert_allclose(g2.wavelengths, granule.wavelengths)
    # NaNs preserved through fill-value encoding
    assert np.isnan(g2.i).sum() == np.isnan(granule.i).sum()
    ds = HARP2Dataset(CONFIG, g2)
    assert ds.num_rays > 0


def test_epoch_permutation_and_gather(dataset):
    rays = dataset.rays()
    n = dataset.num_rays
    bs = 32
    perm = batching.epoch_permutation(jax.random.PRNGKey(0), n, bs)
    nb = n // bs
    assert perm.shape == (nb * bs,)
    assert len(np.unique(np.asarray(perm))) == nb * bs  # no repeats

    batch = batching.batch_at_step(rays, perm, jnp.asarray(2), bs)
    assert batch["origin"].shape == (bs, 3)
    assert batch["rad"].shape == (bs,)
    np.testing.assert_array_equal(
        np.asarray(batch["idx"]), np.asarray(perm[2 * bs : 3 * bs])
    )
    # gathered values match direct indexing
    np.testing.assert_array_equal(
        np.asarray(batch["origin"]),
        np.asarray(rays["origin"])[np.asarray(batch["idx"])],
    )


def test_sequential_indices_cover_everything(dataset):
    n, bs = dataset.num_rays, 37
    idx = batching.sequential_indices(n, bs)
    mask = batching.valid_mask(n, bs)
    covered = np.asarray(idx)[np.asarray(mask)]
    assert (covered == np.arange(n)).all()


# -- RGB view selection ------------------------------------------------------


def _oracle_rgb_views(angles, counts, irgb, striped, mode):
    """Brute-force oracle: enumerate every (r, g, b) triple."""
    score = np.abs(angles) + striped * 1000.0
    reds = [i for i in range(len(angles)) if irgb[i] == 1]
    greens = [i for i in range(len(angles)) if irgb[i] == 2]
    blues = [i for i in range(len(angles)) if irgb[i] == 3]
    if not reds:
        best = int(np.argmin(score))
        return [best, best, best]
    if not greens or not blues:
        best = min(reds, key=lambda i: score[i])
        return [best, best, best]
    pair_for = {}
    for r in reds:
        pair_for[r] = min(
            ((g, b) for g in greens for b in blues),
            key=lambda gb: max(angles[r], angles[gb[0]], angles[gb[1]])
            - min(angles[r], angles[gb[0]], angles[gb[1]]),
        )
    if mode == "nadir":
        r = min(reds, key=lambda i: score[i])
    else:  # most_pixels
        r = max(
            reds,
            key=lambda i: min(
                counts[i], counts[pair_for[i][0]], counts[pair_for[i][1]]
            ),
        )
    return [r, pair_for[r][0], pair_for[r][1]]


@pytest.mark.parametrize("mode", ["nadir", "most_pixels"])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_select_rgb_views_matches_oracle(mode, seed):
    from atmonr_tpu.data.harp2 import select_rgb_views

    rng = np.random.RandomState(seed)
    n = 12
    angles = rng.uniform(-60, 60, n)
    counts = rng.randint(10, 1000, n)
    irgb = rng.randint(0, 4, n)
    striped = counts < counts.mean()
    got = select_rgb_views(
        angles, counts, irgb, penalize_striping=True, mode=mode
    )
    want = _oracle_rgb_views(angles, counts, irgb, striped, mode)
    assert got == want


def test_select_rgb_views_degenerate_bands():
    from atmonr_tpu.data.harp2 import select_rgb_views

    angles = np.array([-30.0, 5.0, 40.0])
    counts = np.array([100, 100, 100])
    # no red views at all -> best overall view three times
    got = select_rgb_views(
        angles, counts, np.array([0, 2, 3]), penalize_striping=False
    )
    assert got == [1, 1, 1]
    # red but no blue -> best red three times
    got = select_rgb_views(
        angles, counts, np.array([1, 1, 2]), penalize_striping=False
    )
    assert got == [1, 1, 1]


# -- real-schema L1B fixture ---------------------------------------------------


@pytest.fixture(scope="module")
def real_schema_path(tmp_path_factory):
    from atmonr_tpu.data.synthetic import write_granule_l1b_real_schema

    path = tmp_path_factory.mktemp("l1b") / "PACE_HARP2.20260101T000000.L1B.nc"
    write_granule_l1b_real_schema(path)
    return path


def test_real_schema_reader(real_schema_path):
    """The reader against the full OB.DAAC-style PACE_HARP2 L1B schema:
    90-view complement, dimension scales, fill values, valid ranges."""
    g = read_granule(real_schema_path)
    assert g.level == "L1B"
    assert g.i.shape == (90, 16, 10)
    assert g.view_angles.shape == (90,) and g.wavelengths.shape == (90,)
    # fill-coded pixels surface as NaN (across-track edge is fully filled)
    assert np.isnan(g.i[:, :, 0]).all()
    assert not np.isnan(g.lat).any()
    # the real view complement: 60 red, 10 each IR/green/blue
    _, irgb_all = get_indexes(g, 90.0)
    counts = dict(zip(*np.unique(irgb_all, return_counts=True)))
    assert counts == {0: 10, 1: 60, 2: 10, 3: 10}


def test_real_schema_dataset_dodges_striped_views(real_schema_path):
    g = read_granule(real_schema_path)
    ds = HARP2Dataset(dict(CONFIG, max_abs_view_angle=60.0), g)
    # striped views (half their pixels fill-coded) must lose the rgb pick
    num_valid = (~np.isnan(ds.int_arr)).sum(axis=0)
    striped = num_valid < num_valid.mean()
    red = ds.best_rgb_idx[0]
    assert ds.irgb_idx[red] == 1 and not striped[red]
    # full ray build sane on the 90-view set
    assert ds.num_rays > 0
    assert np.isfinite(ds.ray_origin_norm).all()
    assert np.isfinite(ds.ray_rad).all()


def test_read_var_scale_offset_and_valid_range(tmp_path):
    """netCDF4 unpacking semantics on the h5py path: scale_factor/add_offset
    applied, _FillValue and out-of-valid-range raw values -> NaN."""
    import h5py

    from atmonr_tpu.data.granule import _read_var

    p = tmp_path / "packed.nc"
    raw = np.array([[0, 100, -32767, 30000, -5]], dtype=np.int16)
    with h5py.File(p, "w") as f:
        ds = f.create_dataset("x", data=raw)
        ds.attrs["_FillValue"] = np.int16(-32767)
        ds.attrs["valid_min"] = np.int16(0)
        ds.attrs["valid_max"] = np.int16(20000)
        ds.attrs["scale_factor"] = np.float32(0.01)
        ds.attrs["add_offset"] = np.float32(5.0)
    with h5py.File(p, "r") as f:
        out = _read_var(f, "x")
    np.testing.assert_allclose(out[0, :2], [5.0, 6.0])
    assert np.isnan(out[0, 2])  # fill
    assert np.isnan(out[0, 3])  # > valid_max
    assert np.isnan(out[0, 4])  # < valid_min


class _FakeResult:
    def __init__(self, native_id):
        self.render_dict = {"meta": {"native-id": native_id}}


class _FakeEarthaccess:
    """Records the earthaccess calls the download hook makes (no network)."""

    def __init__(self, results):
        self._results = results
        self.calls = {}

    def login(self, persist=False):
        self.calls["login"] = {"persist": persist}

    def search_data(self, short_name, temporal):
        self.calls["search"] = {"short_name": short_name, "temporal": temporal}
        return self._results

    def download(self, result, dst):
        self.calls["download"] = {"result": result, "dst": dst}


@pytest.mark.parametrize("level", ["L1B", "L1C"])
def test_earthaccess_download_hook(monkeypatch, tmp_path, level):
    """The auto-download hook (data/factory.py, mirroring reference
    harp2.py:432-458) searches the right short name per level, derives the
    temporal window from the filename timestamp, filters candidates by the
    dot-shortened native-id, and downloads the first match."""
    import sys

    from atmonr_tpu.data import factory

    name = f"PACE_HARP2.20240507T131726.{level}.V2.5km.nc"
    short = ".".join(name.split(".")[:4])
    hit = _FakeResult(f"prefix.{short}.suffix")
    fake = _FakeEarthaccess([_FakeResult("PACE_HARP2.other"), hit])
    monkeypatch.setitem(sys.modules, "earthaccess", fake)

    factory.download(name, tmp_path, level)

    assert fake.calls["login"] == {"persist": True}
    assert fake.calls["search"]["short_name"] == f"PACE_HARP2_{level}_SCI"
    # the window is [granule day, next day): no direct filename search in
    # earthaccess, so the timestamp bounds the query
    assert fake.calls["search"]["temporal"] == ("2024-05-07", "2024-05-08")
    assert fake.calls["download"]["result"] is hit
    assert fake.calls["download"]["dst"] == str(tmp_path)


def test_earthaccess_download_not_found(monkeypatch, tmp_path):
    import sys

    from atmonr_tpu.data import factory

    fake = _FakeEarthaccess([])
    monkeypatch.setitem(sys.modules, "earthaccess", fake)
    with pytest.raises(ValueError, match="Could not find"):
        factory.download(
            "PACE_HARP2.20240507T131726.L1B.V2.nc", tmp_path, "L1B"
        )


def test_missing_granule_offline_error(tmp_path):
    """Without earthaccess installed the factory raises the actionable
    offline error instead of an ImportError."""
    with pytest.raises(FileNotFoundError, match="synthetic"):
        from atmonr_tpu.data import factory

        factory.get_dataset(
            CONFIG, "PACE_HARP2.20240507T131726.L1B.V2.nc", tmp_path
        )
