"""Make an orbit video of the extracted extinction volume.

CLI-compatible with the reference ``scripts/make_video.py``: reads an extract
netCDF and renders an orbit video. Two renderers:

- ``--renderer vdb``: the reference's path — write a km-scale OpenVDB grid
  and shell out to the ``vdb_render`` C++ binary per frame (optional
  host-side dependencies).
- ``--renderer internal``: the framework's own jitted JAX volume renderer
  (``atmonr_tpu.extract.orbit_render``) — zero native rendering deps, runs
  on CPU or TPU. Default ``auto`` picks vdb when available, else internal.

Frames are stitched with ffmpeg when present; otherwise the frames are kept
on disk and a warning is printed.
"""

import argparse
import os
import shutil
import subprocess
import warnings
from pathlib import Path

import numpy as np


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser()
    parser.add_argument("--extract-filepath", type=str, required=True)
    parser.add_argument("--vdb-filepath", type=str, required=True)
    parser.add_argument("--video-filepath", type=str, required=True)
    parser.add_argument(
        "--render-band-idx", type=int, default=2, help="Band to render."
    )
    parser.add_argument("--res", type=str, default="640x480")
    parser.add_argument("--frame-rate", type=int, default=60)
    parser.add_argument("--duration", type=float, default=10.0)
    parser.add_argument("--absorb", nargs=3, type=float, default=(0.1, 0.1, 0.1))
    parser.add_argument("--cutoff", type=float, default=0.01)
    parser.add_argument(
        "--light-source-dir", nargs=3, type=float, default=(0.0, 1.0, 0.0)
    )
    parser.add_argument(
        "--light-source-color", nargs=3, type=float, default=(1.0, 1.0, 1.0)
    )
    parser.add_argument("--scatter", nargs=3, type=float, default=(0.7, 0.7, 0.7))
    parser.add_argument(
        "--renderer",
        choices=("auto", "vdb", "internal"),
        default="auto",
        help="'vdb' = OpenVDB + vdb_render (reference path); 'internal' = "
        "the framework's own JAX volume renderer (no native deps).",
    )
    args = parser.parse_args()
    assert Path(args.extract_filepath).exists()
    args.res = [int(pix) for pix in args.res.split("x")]
    assert len(args.res) == 2 and args.res[0] > 0 and args.res[1] > 0
    if args.res[0] * args.res[1] > 1920 * 1080:
        warnings.warn(
            f"Rendering at {args.res} will be slow and may exhaust memory."
        )
    assert args.duration > 0
    return args


def read_extract_sigma(path: str, band_idx: int):
    """Read (along, across, vert, bands) extinction from an extract netCDF
    and orient it for rendering (height on the y-axis, right-handed)."""
    import h5py

    with h5py.File(path, "r") as f:
        # read fully, flip in numpy (h5py rejects negative-step slicing)
        full = np.asarray(f["extinction_coefficient"][()])
        if band_idx >= full.shape[-1]:
            warnings.warn(
                f"band {band_idx} not in extract ({full.shape[-1]} band(s), "
                "single-band extinction); rendering band 0."
            )
            band_idx = 0
        sigma = np.ascontiguousarray(full[:, :, ::-1, band_idx])
        fill = f["extinction_coefficient"].attrs.get("_FillValue")
        if fill is not None:
            sigma[sigma == np.asarray(fill).ravel()[0]] = np.nan
        scene_scale = float(f.attrs["neural_rendering_scene_scale"])
    sigma = np.ascontiguousarray(np.transpose(sigma, (1, 2, 0)))
    return sigma, scene_scale


def _render_frames_vdb(args, sigma, scene_scale) -> None:
    """The reference's renderer: OpenVDB grid + vdb_render per frame."""
    try:
        import pyopenvdb as vdb  # type: ignore
    except ImportError:
        import openvdb as vdb  # type: ignore

    grid = vdb.FloatGrid()
    # km scale works well with vdb_render
    grid.copyFromArray(sigma * scene_scale / 1000)
    vdb.write(args.vdb_filepath, grids=[grid])

    num_frames = int(args.duration * args.frame_rate)
    times = np.linspace(0, args.duration, num_frames)
    center = (sigma.shape[0] / 2, sigma.shape[1] / 2, sigma.shape[2] / 2)

    orbit_radius = 1.3 * np.linalg.norm(sigma.shape)
    t_circle = 2 * np.pi * times / args.duration
    orbit_x = np.cos(t_circle) * orbit_radius + center[0]
    orbit_y = np.sin(t_circle) * orbit_radius + center[2]
    view_height = 0.5 * np.linalg.norm(sigma.shape)
    lookat = f"{center[0]},0,{center[2]}"

    res = "x".join(str(pix) for pix in args.res)
    absorb = ",".join(str(el) for el in args.absorb)
    light = ",".join(
        str(el) for el in list(args.light_source_dir) + list(args.light_source_color)
    )
    scatter = ",".join(str(el) for el in args.scatter)
    for idx in range(times.shape[0]):
        frame_file = f"_temp_frames/{idx:06d}.ppm"
        cmd = (
            f"vdb_render {args.vdb_filepath} {frame_file} -compression none "
            f"-lookat {lookat} -translate "
            f"{orbit_x[idx]},{view_height},{orbit_y[idx]} -res {res} "
            f"-absorb {absorb} -cutoff {args.cutoff} -light {light} "
            f"-scatter {scatter}"
        )
        subprocess.run(
            cmd.split(" "),
            stdout=subprocess.DEVNULL,
            stderr=subprocess.STDOUT,
        )


def _render_frames_internal(args, sigma, scene_scale) -> None:
    """The framework's own jitted volume renderer (no native deps)."""
    from atmonr_tpu.extract.orbit_render import render_orbit, write_ppm

    num_frames = int(args.duration * args.frame_rate)
    frames = render_orbit(
        sigma * scene_scale / 1000,
        num_frames,
        width=args.res[0],
        height=args.res[1],
    )
    for idx, frame in enumerate(frames):
        write_ppm(f"_temp_frames/{idx:06d}.ppm", frame)


def main() -> None:
    args = parse_args()
    renderer = args.renderer
    if renderer == "auto":
        try:
            import pyopenvdb  # type: ignore # noqa: F401

            renderer = "vdb"
        except ImportError:
            try:
                import openvdb  # type: ignore # noqa: F401

                renderer = "vdb"
            except ImportError:
                renderer = "internal"

    sigma, scene_scale = read_extract_sigma(
        args.extract_filepath, args.render_band_idx
    )
    if Path("_temp_frames").exists():
        shutil.rmtree("_temp_frames")
    os.makedirs("_temp_frames", exist_ok=True)
    if renderer == "vdb":
        _render_frames_vdb(args, sigma, scene_scale)
    else:
        _render_frames_internal(args, sigma, scene_scale)

    res = "x".join(str(pix) for pix in args.res)
    ffmpeg_cmd = (
        f"ffmpeg -framerate {args.frame_rate} -i _temp_frames/%06d.ppm "
        f"-c:v libx264 -pix_fmt yuv420p -s {res} -y {args.video_filepath}"
    )
    if shutil.which("ffmpeg") is None:
        warnings.warn(
            "ffmpeg not found; leaving rendered frames in _temp_frames/."
        )
        return
    subprocess.run(
        ffmpeg_cmd.split(" "),
        stdout=subprocess.DEVNULL,
        stderr=subprocess.STDOUT,
    )
    shutil.rmtree("_temp_frames")


if __name__ == "__main__":
    main()
