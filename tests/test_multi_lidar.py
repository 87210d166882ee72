"""Multi-LiDAR merging (BASELINE config #5)."""

import numpy as np

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.multi_lidar import Extrinsics, merge_scans
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.oracle import run_oracle


def test_identity_merge_is_concat():
    a = np.random.rand(100, 4).astype(np.float32)
    b = np.random.rand(50, 4).astype(np.float32)
    m = merge_scans([a, b], [Extrinsics(), Extrinsics()])
    np.testing.assert_allclose(m[:100], a, atol=1e-6)
    np.testing.assert_allclose(m[100:], b, atol=1e-6)


def test_translation_and_yaw():
    pts = np.array([[1.0, 0.0, 0.5, 0.7]], np.float32)
    m = merge_scans([pts], [Extrinsics(x=2.0, yaw_deg=90.0)])
    np.testing.assert_allclose(m[0, :3], [2.0, 1.0, 0.5], atol=1e-5)
    assert m[0, 3] == np.float32(0.7)


def test_missing_returns_stay_zero():
    pts = np.zeros((10, 4), np.float32)
    m = merge_scans([pts], [Extrinsics(x=5.0, z=1.0)])
    assert not m[:, :3].any()  # would otherwise become phantom points at (5,0,1)


def test_merged_rig_through_pipeline():
    # Two sensors offset laterally; merged cloud must flow through the
    # oracle end-to-end with plausible output.
    left = make_scan(SCENES["two_curbs"](), n_rings=16, n_azimuth=256, seed=1)
    right = make_scan(SCENES["two_curbs"](), n_rings=16, n_azimuth=256, seed=2)
    merged = merge_scans(
        [left, right],
        [Extrinsics(y=0.5, z=0.1), Extrinsics(y=-0.5, z=-0.1)])
    res = run_oracle(merged, FilterConfig())
    assert res.ok
    # two sensors at different heights -> roughly doubled ring count
    assert res.num_rings > 16
    assert (res.labels == 2).sum() > 0
