"""Tests for the internal (JAX) orbit volume renderer."""

import numpy as np

from atmonr_tpu.extract.orbit_render import render_orbit, write_ppm


def test_orbit_frames_show_the_volume(tmp_path):
    # a dense cube in the middle of an empty volume
    vol = np.zeros((24, 16, 20), np.float32)
    vol[8:16, 4:12, 6:14] = 0.5
    frames = list(render_orbit(vol, num_frames=3, width=64, height=48))
    assert len(frames) == 3
    for f in frames:
        assert f.shape == (48, 64) and f.dtype == np.uint8
        assert f.max() > 32, "the cube must be visible"
        assert (f == 0).any(), "background must stay black"
    # orbiting must change the view
    assert not np.array_equal(frames[0], frames[1])

    p = tmp_path / "f.ppm"
    write_ppm(p, frames[0])
    raw = p.read_bytes()
    assert raw.startswith(b"P5\n64 48\n255\n")
    assert len(raw) == len(b"P5\n64 48\n255\n") + 64 * 48


def test_orbit_render_handles_nan():
    vol = np.full((8, 8, 8), np.nan, np.float32)
    vol[2:6, 2:6, 2:6] = 1.0
    (frame,) = list(render_orbit(vol, num_frames=1, width=32, height=24))
    assert np.isfinite(frame).all()
    assert frame.max() > 0
