"""Generate golden parity files from the reference implementation.

Runs the reference (PyTorch, CPU) at /root/reference on deterministic inputs
and records outputs into tests/golden/*.npz. Run once in an environment where
the reference is mounted; the committed .npz files let parity tests run
anywhere without the reference present.

Usage: python tools/gen_golden.py [--reference /root/reference]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"


def gen_geo(torch, atm_geo):
    rng = np.random.default_rng(0)
    lat = rng.uniform(-80, 80, size=(6, 5))
    lon = rng.uniform(-179, 179, size=(6, 5))
    alt = rng.uniform(0, 9000, size=(6, 5))

    t = lambda a: torch.from_numpy(np.asarray(a))  # noqa: E731

    x, y, z = atm_geo.horizontal_to_cartesian(t(lat), t(lon), t(alt))
    lat_rt, lon_rt, alt_rt = atm_geo.cartesian_to_horizontal(x, y, z)

    # get_rays on a small grid
    r_lat = rng.uniform(-60, 60, size=(4, 3))
    r_lon = rng.uniform(-170, 170, size=(4, 3))
    r_alt = rng.uniform(0, 3000, size=(4, 3))
    r_thetav = np.abs(rng.uniform(-45, 45, size=(4, 3)))
    r_phiv = rng.uniform(-180, 180, size=(4, 3))
    origins, dirs, lens = atm_geo.get_rays(
        t(r_lat), t(r_lon), t(r_alt), t(r_thetav), t(r_phiv), 20000.0
    )

    v_lat1 = rng.uniform(-70, 70, size=8)
    v_lon1 = rng.uniform(-170, 170, size=8)
    v_lat2 = v_lat1 + rng.uniform(-3, 3, size=8)
    v_lon2 = v_lon1 + rng.uniform(-3, 3, size=8)
    v_s, v_a1, v_a2 = atm_geo.vincenty_distance(
        (t(v_lat1), t(v_lon1)), (t(v_lat2), t(v_lon2))
    )

    np.savez(
        GOLDEN / "geo_wgs84.npz",
        lat=lat, lon=lon, alt=alt,
        x=x.numpy(), y=y.numpy(), z=z.numpy(),
        lat_rt=lat_rt.numpy(), lon_rt=lon_rt.numpy(), alt_rt=alt_rt.numpy(),
        r_lat=r_lat, r_lon=r_lon, r_alt=r_alt,
        r_thetav=r_thetav, r_phiv=r_phiv,
        ray_origins=origins.numpy(), ray_dirs=dirs.numpy(), ray_lens=lens.numpy(),
        v_lat1=v_lat1, v_lon1=v_lon1, v_lat2=v_lat2, v_lon2=v_lon2,
        v_s=v_s.numpy(), v_a1=v_a1.numpy(), v_a2=v_a2.numpy(),
    )
    print("wrote geo_wgs84.npz")


def gen_render(torch, graphics_utils, samplers, losses_mod, encoders_mod):
    """Compositor, sampler (deterministic), loss, and encoder goldens."""
    g = torch.Generator().manual_seed(1234)
    B, N, C = 16, 32, 4
    z_vals = torch.sort(torch.rand((B, N), generator=g) * 20.0, dim=-1)[0]
    color = torch.rand((B, N, C), generator=g)
    sigma = torch.rand((B, N, C), generator=g) * 0.3
    sigma1 = torch.rand((B, N, 1), generator=g) * 0.3
    color_surf = torch.rand((B, C), generator=g)

    cm, alpha, w = graphics_utils.render(z_vals, color, sigma)
    cm1, alpha1, w1 = graphics_utils.render(z_vals, color, sigma1)
    cms, alphas, ws, cma, cmsurf = graphics_utils.render_with_surface(
        z_vals, color, sigma, color_surf
    )

    # deterministic (midpoint) stratified sampling
    origin = torch.rand((B, 3), generator=g) * 2 - 1
    direction = torch.nn.functional.normalize(
        torch.rand((B, 3), generator=g) - 0.5, dim=-1
    )
    length = torch.rand((B,), generator=g) * 2
    batch = {"origin": origin, "dir": direction, "len": length}
    pts_mid, z_mid = samplers.sample_uniform_bins(batch, n_bins=24, random=False)

    # losses
    pred = torch.rand((B,), generator=g) * 5
    gt = torch.rand((B,), generator=g) * 5
    max_i = 5.0
    loss_vals = {
        "dark": losses_mod.dark_loss(pred, gt, max_i).item(),
        "hdr": losses_mod.hdr_loss(pred, gt, max_i).item(),
        "l1": losses_mod.l1_loss(pred, gt, max_i).item(),
        "l1_plus_hdr": losses_mod.l1_plus_hdr_loss(pred, gt, max_i).item(),
        "mse": losses_mod.mse_loss(pred, gt, max_i).item(),
        "mse_plus_hdr": losses_mod.mse_plus_hdr_loss(pred, gt, max_i).item(),
    }

    # positional encoding: scalar L and per-axis list L
    pts = torch.rand((B, 8, 3), generator=g) * 2 - 1
    enc_scalar = encoders_mod.positional_encoding(pts.view(-1, 3), 4)
    enc_list = encoders_mod.positional_encoding(pts, [5, 4, 3])

    np.savez(
        GOLDEN / "render_math.npz",
        z_vals=z_vals.numpy(), color=color.numpy(), sigma=sigma.numpy(),
        sigma1=sigma1.numpy(), color_surf=color_surf.numpy(),
        color_map=cm.numpy(), alpha=alpha.numpy(), weights=w.numpy(),
        color_map_s1=cm1.numpy(), weights_s1=w1.numpy(),
        cm_total=cms.numpy(), cm_atmo=cma.numpy(), cm_surf=cmsurf.numpy(),
        origin=origin.numpy(), direction=direction.numpy(), length=length.numpy(),
        pts_mid=pts_mid.numpy(), z_mid=z_mid.numpy(),
        pred=pred.numpy(), gt=gt.numpy(), max_i=np.float64(max_i),
        **{f"loss_{k}": np.float64(v) for k, v in loss_vals.items()},
        enc_pts=pts.numpy(), enc_scalar=enc_scalar.numpy(),
        enc_list=enc_list.numpy(),
    )
    print("wrote render_math.npz")


def gen_nerf_mlp(torch, nerf_models, encoders_mod):
    """AtmoNeRF MLP forward with recorded weights (eval mode, no noise)."""
    torch.manual_seed(7)
    nerf_c, nerf_f = nerf_models.get_model(
        hidden_dim=64, N_lambda=4, L_x=[5, 5, 4], L_d=2, include_height=False
    )
    nerf_f.eval()
    pos_ch = nerf_f.pos_channels
    dir_ch = nerf_f.dir_channels
    g = torch.Generator().manual_seed(99)
    x = torch.rand((32, pos_ch + dir_ch), generator=g) * 2 - 1
    with torch.no_grad():
        color, sigma = nerf_f(x)
        feat_pos, sigma_pos = nerf_f.forward_pos_only(x[:, :pos_ch])

    weights = {k: v.numpy() for k, v in nerf_f.state_dict().items()}
    np.savez(
        GOLDEN / "nerf_mlp.npz",
        x=x.numpy(), color=color.numpy(), sigma=sigma.numpy(),
        sigma_pos=sigma_pos.numpy(),
        pos_channels=np.int64(pos_ch), dir_channels=np.int64(dir_ch),
        **{f"w_{k.replace('.', '_')}": v for k, v in weights.items()},
    )
    print("wrote nerf_mlp.npz")


class _H5Var:
    """netCDF4.Variable stand-in over an h5py dataset: slicing returns a
    masked array when a _FillValue is declared (the HARP2 loader calls
    ``.filled``), a plain ndarray otherwise (the DEM path calls
    ``torch.from_numpy`` directly)."""

    def __init__(self, dset):
        self._d = dset

    @property
    def shape(self):
        return self._d.shape

    def __getitem__(self, key):
        def _as_int(v):
            return None if v is None else int(v)

        if isinstance(key, slice):
            key = slice(_as_int(key.start), _as_int(key.stop), _as_int(key.step))
        elif isinstance(key, tuple):
            key = tuple(
                slice(_as_int(k.start), _as_int(k.stop), _as_int(k.step))
                if isinstance(k, slice)
                else k
                for k in key
            )
        # read fully, index in numpy: real netCDF4 accepts unsorted fancy
        # indices (the IRGB view reorder), h5py does not; files are tiny
        arr = np.asarray(self._d[()], dtype=np.float64)[key]
        fill = self._d.attrs.get("_FillValue")
        if fill is None:
            return arr
        return np.ma.MaskedArray(arr, mask=(arr == np.float64(fill)))


class _H5Dim:
    def __init__(self, size):
        self.size = size


class _H5NetCDF:
    """Minimal netCDF4.Dataset stand-in over an h5py file — exactly the API
    surface the reference touches (item access by 'group/name', global
    attributes as numpy scalars, ``dimensions`` sizes inferred from the 2-D
    'height' variable for the DEM)."""

    def __init__(self, path, *args, **kwargs):
        import h5py

        self._f = h5py.File(path, "r")

    def __getitem__(self, name):
        return _H5Var(self._f[name])

    def __getattr__(self, name):
        try:
            v = self._f.attrs[name]
        except KeyError as e:
            raise AttributeError(name) from e
        if isinstance(v, bytes):
            return v.decode()
        return np.asarray(v)  # .item() works on 0-d arrays

    @property
    def dimensions(self):
        h = self._f["height"]
        return {"lat": _H5Dim(h.shape[0]), "lon": _H5Dim(h.shape[1])}


def _write_fake_dem(path):
    """Deterministic 1-degree global-ish DEM in the reference's ETOPO1
    layout (attrs upper_lat/left_lon/resolutions, height +
    water_surface_height vars)."""
    import h5py

    lat = np.arange(90.0, -90.5, -1.0)
    lon = np.arange(-180.0, 180.5, 1.0)
    lat2, lon2 = np.meshgrid(lat, lon, indexing="ij")
    height = 400.0 * (1 + np.sin(np.deg2rad(3 * lat2)) * np.cos(np.deg2rad(2 * lon2)))
    wsh = np.zeros_like(height)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.attrs["upper_lat"] = 90.0
        f.attrs["left_lon"] = -180.0
        f.attrs["geospatial_lat_resolution"] = 1.0
        f.attrs["geospatial_lon_resolution"] = 1.0
        f.create_dataset("height", data=height)
        f.create_dataset("water_surface_height", data=wsh)


def gen_dataset_and_voxelgrid(torch):
    """Golden: the reference's FULL dataset machinery (netCDF parse, view
    indexing, ray build incl. the iterative origin solve, filtering,
    normalization) and the Vincenty voxel-grid construction with DEM
    heights, run CPU-only on the same synthetic granule our tests use."""
    import os
    import tempfile

    sys.path.insert(0, str(REPO))
    from atmonr_tpu.data.synthetic import (
        make_synthetic_granule,
        write_granule_l1b,
        write_granule_l1c,
        write_synthetic_earthcare,
    )

    sys.modules["netCDF4"].Dataset = _H5NetCDF
    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only run

    granule = make_synthetic_granule(height=12, width=8, views_per_band=2)
    cfg = {
        "max_abs_view_angle": 45.0,
        "ray_origin_height": 20000,
        "bands_to_keep": [0, 1, 2, 3],
        "rgb_mode": "nadir",
    }
    cwd = os.getcwd()
    try:
        with tempfile.TemporaryDirectory() as td:
            os.chdir(td)
            # 5-token name: the L1C extract derives its filename from it
            name = "PACE_HARP2.20240101T000000.L1B.V2.nc"
            write_granule_l1b(granule, Path("data/HARP2") / name)
            _write_fake_dem("data/ETOPO1_ocssw.nc")
            write_granule_l1c(
                "data/HARP2_L1C/PACE_HARP2.20240101T000000.L1C.V2.5km.nc"
            )
            write_synthetic_earthcare("data/EarthCARE/synthetic_ebd.h5")

            from atmonr.datasets.harp2 import HARP2Dataset as RefDS
            from atmonr.datasets.harp2_extract import (
                HARP2EarthCAREExtractDataset as RefEarthCARE,
                HARP2L1CExtractDataset as RefL1C,
                HARP2VoxelGridExtractDataset as RefVoxelGrid,
            )

            ds = RefDS(dict(cfg), name)
            vg = RefVoxelGrid(
                ds, horizontal_step=5000.0, alt_step=2000.0, max_alt=10000.0
            )
            l1c = RefL1C(ds, alt_step=2000.0, max_alt=10000.0)
            ec = RefEarthCARE(
                ds, "synthetic_ebd.h5", earthcare_range=[5, 30]
            )
    finally:
        os.chdir(cwd)

    np.savez(
        GOLDEN / "harp2_dataset.npz",
        view_idx=ds.view_idx,
        irgb_idx=ds.irgb_idx,
        max_i=np.float64(ds.max_i),
        ray_filter=ds.ray_filter.cpu().numpy(),
        ray_origin_norm=ds.ray_origin_norm.cpu().numpy(),
        ray_dir=ds.ray_dir.cpu().numpy(),
        ray_len_norm=ds.ray_len_norm.cpu().numpy(),
        ray_rad=ds.ray_rad.cpu().numpy(),
        ray_alt=ds.ray_alt.cpu().numpy(),
        ray_irgb_idx=ds.ray_irgb_idx.cpu().numpy(),
        scale=np.float64(ds.scale.item() if hasattr(ds.scale, "item") else ds.scale),
        offset=np.asarray(ds.offset.cpu().numpy() if hasattr(ds.offset, "cpu") else ds.offset),
        vg_xyz=vg.xyz.cpu().numpy(),
        vg_shp=np.asarray(vg.shp),
        vg_sample_alt=vg.sample_alt.cpu().numpy(),
        vg_height=vg.height.cpu().numpy(),
        l1c_xyz=l1c.xyz.cpu().numpy(),
        l1c_shp=np.asarray(l1c.shp),
        l1c_height=l1c.height.cpu().numpy(),
        ec_xyz=ec.xyz.cpu().numpy(),
        ec_shp=np.asarray(ec.shp),
    )
    print(f"dataset+extract goldens: {ds.ray_origin_norm.shape[0]} rays, "
          f"voxelgrid {tuple(vg.shp)}, l1c {tuple(l1c.shp)}, "
          f"earthcare {tuple(ec.shp)}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    sys.path.insert(0, str(Path(args.reference) / "src"))
    # stub optional heavy deps the reference imports at module level but this
    # generator never calls (download/IO/metrics)
    import types

    for missing in ["earthaccess", "netCDF4", "torchmetrics"]:
        try:
            __import__(missing)
        except ImportError:
            mod = types.ModuleType(missing)
            mod.Dataset = object  # annotation-only usage
            mod.Variable = object
            sys.modules[missing] = mod
    try:
        import torchmetrics.functional.image  # noqa: F401
    except ImportError:
        m = types.ModuleType("torchmetrics.functional.image")
        m.peak_signal_noise_ratio = None
        m.structural_similarity_index_measure = None
        sys.modules["torchmetrics.functional"] = types.ModuleType(
            "torchmetrics.functional"
        )
        sys.modules["torchmetrics.functional.image"] = m
    import torch

    from atmonr.geospatial import wgs_84 as atm_geo
    from atmonr import graphics_utils, samplers, losses, encoders
    from atmonr.models import nerf as nerf_models

    GOLDEN.mkdir(parents=True, exist_ok=True)
    gen_geo(torch, atm_geo)
    gen_render(torch, graphics_utils, samplers, losses, encoders)
    gen_nerf_mlp(torch, nerf_models, encoders)
    gen_nerf_pipeline(torch)
    gen_ngp_pipeline(torch)
    gen_dataset_and_voxelgrid(torch)


def gen_nerf_pipeline(torch):
    """Record a full deterministic reference NeRFPipeline forward + loss +
    parameter gradients on a synthetic ray batch (no preprocessor, no height;
    midpoint stratified sampling, quantile-midpoint importance sampling,
    eval mode = no density noise)."""
    import atmonr.pipelines.nerf as ref_nerf
    from atmonr import samplers as ref_samplers

    config = {
        "type": "NeRF",
        "include_height": False,
        "point_preprocessor": None,
        "num_bands": 4,
        "ray_origin_height": 20000,
        "sampler": {"N_c": 8, "N_f": 16},
        "encoder": {"L_x": [5, 5, 4], "L_d": 2},
        "mlp_hidden_dim": 32,
    }

    class MockDataset:
        scale = 200000.0
        offset = torch.zeros(3, dtype=torch.float64)
        config = {"ray_origin_height": 20000}

    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        torch.manual_seed(11)
        pipe = ref_nerf.NeRFPipeline(config, MockDataset())
    pipe.eval()  # no density noise

    # deterministic sampling: midpoint stratified bins...
    orig_uniform = ref_samplers.sample_uniform_bins
    ref_nerf.sample_uniform_bins = lambda rb, n_bins: orig_uniform(
        rb, n_bins, random=False
    )
    # ...and quantile-midpoint inverse-CDF sampling (u = (i + 0.5) / n)
    orig_rand = torch.rand

    def _mid_rand(*shape, **kwargs):
        if shape and isinstance(shape[0], list):
            shape = tuple(shape[0])
        n = shape[-1]
        u = (torch.arange(n, dtype=torch.get_default_dtype()) + 0.5) / n
        return u.expand(shape).contiguous()

    g = torch.Generator().manual_seed(21)
    b = 32
    origin = torch.rand((b, 3), generator=g) * 1.6 - 0.8
    direction = torch.nn.functional.normalize(
        torch.rand((b, 3), generator=g) - 0.5, dim=-1
    )
    batch = {
        "origin": origin,
        "dir": direction,
        "len": torch.rand((b,), generator=g) + 1.0,
        "rad": torch.rand((b,), generator=g) * 2.0,
        "irgb_idx": torch.randint(0, 4, (b,), generator=g),
    }

    try:
        torch.rand = _mid_rand
        results = pipe.forward(batch)
        loss = pipe.compute_loss(batch, results)
    finally:
        torch.rand = orig_rand
        ref_nerf.sample_uniform_bins = orig_uniform

    loss.backward()

    out = {
        "scale": np.float64(MockDataset.scale),
        "origin": origin.numpy(),
        "direction": direction.numpy(),
        "length": batch["len"].numpy(),
        "rad": batch["rad"].numpy(),
        "irgb_idx": batch["irgb_idx"].numpy(),
        "loss": loss.detach().numpy(),
        "color_map_coarse": results["color_map_coarse"].detach().numpy(),
        "color_map_fine": results["color_map_fine"].detach().numpy(),
        "z_vals_coarse": results["z_vals_coarse"].detach().numpy(),
        "z_vals_fine": results["z_vals_fine"].detach().numpy(),
        "weights_coarse": results["weights_coarse"].detach().numpy(),
        "sigma_fine": results["sigma_fine"].detach().numpy(),
    }
    for mode in ["coarse", "fine"]:
        model = pipe.nerf[mode]
        for k, v in model.state_dict().items():
            out[f"w_{mode}_{k.replace('.', '_')}"] = v.numpy()
        for k, v in model.named_parameters():
            out[f"g_{mode}_{k.replace('.', '_')}"] = v.grad.numpy()
    np.savez(GOLDEN / "nerf_pipeline.npz", **out)
    print("wrote nerf_pipeline.npz")




def gen_ngp_pipeline(torch):
    """Record Instant-NGP pipeline-level goldens from a torch CPU oracle.

    tiny-cuda-nn needs CUDA, so the reference InstantNGPPipeline cannot run
    here; instead this oracle implements the tcnn module semantics
    (multiresolution HashGrid per Mueller et al. 2022 Sec. 3 + bias-free
    narrow ReLU MLPs + real-SH basis) in plain torch, and reuses the
    reference's OWN torch code for everything that exists outside tcnn:
    ``sample_uniform_bins(random=False)``, ``render_with_surface``, and
    ``mse_plus_hdr_loss`` (reference instant_ngp.py:129-206 structure).
    torch.autograd then yields loss gradients for every parameter tensor —
    the NGP analog of the hierarchical-NeRF 44-tensor gradient gate.
    """
    from atmonr import graphics_utils, losses
    from atmonr import samplers as ref_samplers

    PRIMES = (1, 2654435761, 805459861)

    class HashLevels:
        """tcnn HashGrid semantics: per-level D-linear interp of features at
        grid corners, dense indexing when the level fits, spatial-hash
        indexing otherwise; level sizes 8-aligned; corner order x-fastest."""

        def __init__(self, n_dims, n_levels, n_feats, log2_size, base_res, growth):
            self.n_dims, self.n_levels, self.n_feats = n_dims, n_levels, n_feats
            self.hashmap_size = 1 << log2_size
            self.scales = [
                float(np.exp2(lv * np.log2(growth)) * base_res - 1.0)
                for lv in range(n_levels)
            ]
            self.res = [int(np.ceil(s)) + 1 for s in self.scales]
            align = lambda n: -(-n // 8) * 8  # noqa: E731
            self.sizes = [
                align(min(r**n_dims, self.hashmap_size)) for r in self.res
            ]
            self.offsets = np.concatenate([[0], np.cumsum(self.sizes)[:-1]])
            self.total = int(np.sum(self.sizes))
            corners = np.stack(
                np.meshgrid(*([np.arange(2)] * n_dims), indexing="ij"), axis=-1
            ).reshape(-1, n_dims)[:, ::-1]
            self.corners = torch.from_numpy(corners.copy()).long()

        def encode(self, table, x):
            outs = []
            for lv in range(self.n_levels):
                pos = x.float() * self.scales[lv] + 0.5
                grid = torch.floor(pos)
                frac = pos - grid
                base = grid.long().clamp(0, self.res[lv] - 2)
                g = base[:, None, :] + self.corners[None]
                if self.res[lv] ** self.n_dims <= self.sizes[lv]:
                    stride = 1
                    idx = torch.zeros(g.shape[:2], dtype=torch.long)
                    for d in range(self.n_dims):
                        idx = idx + g[..., d] * stride
                        stride *= self.res[lv]
                else:
                    acc = (g[..., 0].numpy().astype(np.uint32)) * np.uint32(
                        PRIMES[0]
                    )
                    for d in range(1, self.n_dims):
                        acc = acc ^ (
                            g[..., d].numpy().astype(np.uint32)
                            * np.uint32(PRIMES[d])
                        )
                    idx = torch.from_numpy(
                        (acc & np.uint32(self.hashmap_size - 1)).astype(np.int64)
                    )
                w = torch.where(
                    self.corners[None] == 1, frac[:, None, :], 1 - frac[:, None, :]
                ).prod(dim=-1)
                feats = table[int(self.offsets[lv]) + idx]
                outs.append((feats * w[..., None]).sum(dim=1))
            return torch.cat(outs, dim=-1)

    def sh2(v):
        v = v * 2.0 - 1.0  # tcnn treats inputs as [0,1]-scaled
        x, y, z = v[..., 0], v[..., 1], v[..., 2]
        return torch.stack(
            [
                torch.full_like(x, 0.28209479177387814),
                -0.48860251190291987 * y,
                0.48860251190291992 * z,
                -0.48860251190291987 * x,
            ],
            dim=-1,
        )

    def mlp(layers, x):
        for i, w in enumerate(layers):
            x = x @ w.T
            if i < len(layers) - 1:
                x = torch.relu(x)
        return x

    # -- scene + config (small but non-degenerate) ---------------------------
    NUM_BANDS, N_SAMPLES, B = 4, 16, 24
    SCALE, ALT_COMPRESS = 150000.0, 8.0
    MAX_I = 2.5
    pos_h = HashLevels(3, n_levels=4, n_feats=2, log2_size=8, base_res=4, growth=1.5)
    surf_h = HashLevels(2, n_levels=3, n_feats=2, log2_size=7, base_res=4, growth=1.5)

    g = torch.Generator().manual_seed(33)
    t_rand = lambda *s: torch.rand(*s, generator=g)  # noqa: E731

    def rand_mlp(in_dim, out_dim, n_neurons, n_hidden):
        dims = [(n_neurons, in_dim)]
        dims += [(n_neurons, n_neurons)] * n_hidden
        dims.append((out_dim, n_neurons))
        return [
            ((t_rand(o, i) * 2 - 1) * (6.0 / (i + o)) ** 0.5).requires_grad_()
            for o, i in dims
        ]

    pos_table = ((t_rand(pos_h.total, 2) * 2 - 1) * 1e-4).requires_grad_()
    surf_table = ((t_rand(surf_h.total, 2) * 2 - 1) * 1e-4).requires_grad_()
    POS_OUT, ND = 16, 1
    pos_mlp = rand_mlp(pos_h.n_levels * 2, POS_OUT, 32, 1)
    dir_mlp = rand_mlp(4 + (POS_OUT - ND), NUM_BANDS, 32, 2)
    surf_mlp = rand_mlp(surf_h.n_levels * 2 + 4, NUM_BANDS, 32, 2)

    origin = t_rand(B, 3) * 1.2 - 0.6
    direction = torch.nn.functional.normalize(t_rand(B, 3) - 0.5, dim=-1)
    ray_len = t_rand(B) * 0.8 + 0.6
    rad = t_rand(B, NUM_BANDS) * MAX_I
    irgb_idx = torch.arange(B) % NUM_BANDS
    batch = {
        "origin": origin,
        "dir": direction,
        "len": ray_len,
        "rad": rad.gather(1, irgb_idx[:, None])[:, 0],
        "irgb_idx": irgb_idx,
    }

    # -- forward, reference instant_ngp.py:129-206 structure -----------------
    pts, z_vals = ref_samplers.sample_uniform_bins(batch, N_SAMPLES, random=False)
    pts_surf = (origin + direction * ray_len[:, None] + 1.0) / 2.0
    unit = (pts + 1.0) / 2.0
    hash_in = torch.cat(
        [unit[..., :2], unit[..., 2:] / ALT_COMPRESS], dim=-1
    ).reshape(B * N_SAMPLES, 3)

    pos_out = mlp(pos_mlp, pos_h.encode(pos_table, hash_in))
    dirs = direction[:, None].expand(B, N_SAMPLES, 3).reshape(-1, 3)
    dir_in = torch.cat([sh2(dirs), pos_out[:, ND:]], dim=1)
    color = mlp(dir_mlp, dir_in).reshape(B, N_SAMPLES, NUM_BANDS)
    surf_in = torch.cat(
        [surf_h.encode(surf_table, pts_surf[:, :2]), sh2(direction)], dim=1
    )
    color_surf = mlp(surf_mlp, surf_in)
    sigma = pos_out[:, :ND].reshape(B, N_SAMPLES, ND)

    color, color_surf, sigma = map(torch.relu, (color, color_surf, sigma))
    color_map, _, weights, color_map_atmo, color_map_surf = (
        graphics_utils.render_with_surface(
            z_vals * (SCALE / 1000.0), color, sigma, color_surf
        )
    )
    pred = color_map.gather(1, irgb_idx[:, None])[:, 0]
    loss = losses.mse_plus_hdr_loss(pred, batch["rad"], MAX_I)
    loss.backward()

    out = {
        "origin": origin,
        "dir": direction,
        "len": ray_len,
        "rad": batch["rad"],
        "irgb_idx": irgb_idx,
        "scale": np.float64(SCALE),
        "max_i": np.float64(MAX_I),
        "pos_table": pos_table.detach(),
        "surf_table": surf_table.detach(),
        "color_map_fine": color_map.detach(),
        "color_map_surf": color_map_surf.detach(),
        "color_map_atmo": color_map_atmo.detach(),
        "weights_fine": weights.detach(),
        "z_vals_fine": z_vals,
        "loss": loss.detach(),
        "grad_pos_table": pos_table.grad,
        "grad_surf_table": surf_table.grad,
    }
    for name, layers in [
        ("pos_mlp", pos_mlp),
        ("dir_mlp", dir_mlp),
        ("surf_mlp", surf_mlp),
    ]:
        for i, w in enumerate(layers):
            out[f"w_{name}_{i}"] = w.detach()
            out[f"grad_{name}_{i}"] = w.grad
    np.savez(
        GOLDEN / "ngp_pipeline.npz",
        **{k: np.asarray(v) for k, v in out.items()},
    )
    print("ngp_pipeline.npz:", len(out), "tensors")
if __name__ == "__main__":
    main()
