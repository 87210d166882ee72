"""dims.rings wiring: ring discovery/binning/layout scale with the
configured channel cap (the reference hardcodes 64,
lidar_segmentation.cpp:4; >64 is a documented extension for high-channel
sensors — see config.PipelineDims)."""

import numpy as np

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit


def _scan_with_rings(n_rings: int, n_azimuth: int = 8) -> np.ndarray:
    """n_rings distinct vertical angles, spaced ~0.3 deg (> the 0.18 deg
    matching interval, so greedy discovery keeps them all distinct).
    All points sit at z = -2 inside the default ROI box."""
    theta = np.deg2rad(np.linspace(5.0, 45.0, n_rings))  # depression angle
    d = 2.0 / np.sin(theta)  # 3-D range so that z == -2
    r_xy = np.sqrt(d * d - 4.0)  # horizontal radius
    az = np.deg2rad(np.linspace(-15.0, 15.0, n_azimuth))
    x = r_xy[None, :] * np.cos(az)[:, None]
    y = r_xy[None, :] * np.sin(az)[:, None]
    z = np.full_like(x, -2.0)
    pts = np.stack([x, y, z, np.ones_like(x)], axis=-1).reshape(-1, 4)
    return pts.astype(np.float32)


def test_128_ring_sensor_keeps_all_rings():
    dims = PipelineDims(max_points=2048, rings=128, ring_capacity=64,
                        beam_capacity=64)
    pts = _scan_with_rings(128)
    out = process_scan_jit(pad_scan(pts, dims.max_points), FilterConfig(),
                           dims)
    assert int(out.num_rings) == 128
    assert out.counts.shape == (128,)
    assert int(out.overflow) == 0
    assert int(np.asarray(out.counts).sum()) == len(pts)
    assert int(np.asarray(out.ring_id).max()) == 128  # sentinel = rings


def test_rings_cap_is_honored():
    # The same 128-angle scan through rings=64 dims: discovery stops at the
    # cap; the remaining angles bin to the nearest discovered ring or drop.
    dims = PipelineDims(max_points=2048, rings=64, ring_capacity=64,
                        beam_capacity=64)
    pts = _scan_with_rings(128)
    out = process_scan_jit(pad_scan(pts, dims.max_points), FilterConfig(),
                           dims)
    assert int(out.num_rings) == 64
    assert out.counts.shape == (64,)


def test_os1_128_preset_has_128_rings():
    assert PipelineDims.for_sensor("os1-128").rings == 128
