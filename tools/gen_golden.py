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


if __name__ == "__main__":
    main()
