"""Star beam-capacity overflow accounting (review finding #5)."""

import numpy as np

import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.oracle import reference as oracle
from urban_road_filter_tpu.ops.star import star_shaped


def test_star_overflow_counted_and_zero_when_capacious():
    cfg = FilterConfig()
    pts = make_scan(SCENES["two_curbs"](), n_rings=24, n_azimuth=256, seed=0)
    pts = pts[oracle.roi_mask(pts, cfg)]
    valid = jnp.ones(len(pts), bool)
    zeros = jnp.zeros(len(pts), jnp.int32)

    _, of_big = star_shaped(jnp.asarray(pts[:, :4]), valid, zeros, cfg, 256)
    assert int(of_big) == 0

    # Squeeze capacity to force truncation; count must surface it.
    _, of_tiny = star_shaped(jnp.asarray(pts[:, :4]), valid, zeros, cfg, 4)
    assert int(of_tiny) > 0


def test_sector_360_routes_to_beam_zero():
    # A point whose f32 sector product rounds to exactly 360 must be
    # processed (the C++ beamp[rep] sentinel routes it to beam 0).
    cfg = FilterConfig()
    base = [[5 + 0.01 * i, 0.02, -1.8, 0.0] for i in range(40)]
    pts = np.array([[10.0, -1e-7, -1.8, 0.0]] + base, np.float32)
    import math

    fi = np.float32(math.atan2(np.float32(-1e-7), np.float32(10.0))) \
        + np.float32(2 * math.pi)
    assert int(np.float32(fi) * np.float32(360 / (2 * math.pi))) == 360
    labels, of = star_shaped(jnp.asarray(pts), jnp.ones(len(pts), bool),
                             jnp.zeros(len(pts), jnp.int32), cfg, 64)
    assert int(of) == 0  # routed into beam 0, not dropped/crashed
