"""Recorded-style PCD fixtures through the full pipeline vs the oracle
(VERDICT r1 Missing #4: parity on sensor-style data, not just in-memory
synthetic arrays).  The fixtures are binary_compressed PCDs with NaN rows
for missing returns — the shape real PCL organized clouds arrive in."""

import glob
import os

import numpy as np
import pytest

from conftest import assert_label_parity
from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.pcd import read_pcd
from urban_road_filter_tpu.oracle import run_oracle
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit

FIXTURES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "fixtures", "*.pcd")))

DIMS = PipelineDims(max_points=16384, rings=64, ring_capacity=1024,
                    beam_capacity=256)


def test_fixtures_exist():
    assert len(FIXTURES) >= 3, "run tools/make_fixtures.py"


@pytest.mark.parametrize("path", FIXTURES, ids=[os.path.basename(p)
                                                for p in FIXTURES])
def test_fixture_parity(path):
    cfg = FilterConfig()
    pts = read_pcd(path, use_native=False)
    assert np.isnan(pts[:, 0]).sum() > 100  # recorded-style NaN returns

    oracle = run_oracle(pts, cfg)
    assert oracle.ok

    # NaN rows must be ROI-dropped, never labeled.
    assert not oracle.roi_mask[np.isnan(pts[:, 0])].any()

    padded = pad_scan(np.nan_to_num(pts, nan=0.0), DIMS.max_points)
    # The device path receives the raw NaN rows: the ADVICE r1 poisoning
    # regression — placement must zero dropped values.
    padded_nan = pad_scan(pts, DIMS.max_points)
    jx = process_scan_jit(padded_nan, cfg, DIMS)
    assert bool(jx.ok)
    assert int(jx.overflow) == 0

    labels = np.asarray(jx.labels)[:len(pts)]
    assert not labels[np.isnan(pts[:, 0])].any()
    got = labels[oracle.roi_mask]
    assert_label_parity(got, oracle.labels, 0.999,
                        f"{os.path.basename(path)} labels")
    # Labels must be meaningful (road + curb both present).
    assert (got == 1).sum() > 100 and (got == 2).sum() > 5

    # Sanity: NaN handling identical to zero-row handling.
    jx0 = process_scan_jit(padded, cfg, DIMS)
    np.testing.assert_array_equal(np.asarray(jx0.labels), np.asarray(jx.labels))
