"""Star beam semantics: no capacity truncation (round 2) + sector-360."""

import numpy as np

import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.oracle import reference as oracle
from urban_road_filter_tpu.ops.star import star_shaped


def test_star_has_no_capacity_truncation():
    """Round 1 truncated beams at `beam_capacity` and counted overflow; the
    reference keeps ALL points per beam (star_shaped_search.cpp walks the
    full vector).  The round-2 sort-based design must mark a curb that lies
    beyond any historical capacity, and report overflow == 0."""
    cfg = FilterConfig()
    # One beam along +x with 600 flat points then a sharp z-jump (curb).
    m = 600
    xs = 2.0 + 0.02 * np.arange(m + 4, dtype=np.float32)
    zs = np.full(m + 4, -1.8, np.float32)
    zs[m:] = -1.0  # jump at index m (well past the old capacity of 4..512)
    pts = np.stack([xs, np.full_like(xs, 1e-4), zs,
                    np.zeros_like(xs)], axis=1)
    labels, of = star_shaped(jnp.asarray(pts), jnp.ones(len(pts), bool),
                             jnp.zeros(len(pts), jnp.int32), cfg, 4)
    assert int(of) == 0
    got = np.asarray(labels)
    # The oracle (full-beam walk) must agree on exactly which point is hit.
    want = np.zeros(len(pts), np.int32)
    oracle.star_shaped_search(pts[:, 0], pts[:, 1], pts[:, 2], want, cfg)
    np.testing.assert_array_equal(got, want)
    assert got.max() == LABEL_CURB and got[m] == LABEL_CURB


def test_star_matches_oracle_on_scene():
    cfg = FilterConfig()
    pts = make_scan(SCENES["two_curbs"](), n_rings=24, n_azimuth=256, seed=0)
    pts = pts[oracle.roi_mask(pts, cfg)].astype(np.float32)
    want = np.zeros(len(pts), np.int32)
    oracle.star_shaped_search(pts[:, 0], pts[:, 1], pts[:, 2], want, cfg)
    labels, of = star_shaped(jnp.asarray(pts[:, :4]),
                             jnp.ones(len(pts), bool),
                             jnp.zeros(len(pts), jnp.int32), cfg, 256)
    assert int(of) == 0
    agree = float(np.mean(np.asarray(labels) == want))
    assert agree >= 0.999, f"star parity {agree:.5f}"


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
    # And the walk over beam 0 must agree with the oracle exactly.
    want = np.zeros(len(pts), np.int32)
    oracle.star_shaped_search(pts[:, 0], pts[:, 1], pts[:, 2], want, cfg)
    np.testing.assert_array_equal(np.asarray(labels), want)
