"""Unit tests for the NumPy oracle — pins the reference semantics
(SURVEY.md section 4, items 1-3)."""

import numpy as np
import pytest

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB, LABEL_NONE, LABEL_ROAD
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan, random_scan
from urban_road_filter_tpu.oracle import run_oracle
from urban_road_filter_tpu.oracle.reference import (
    azimuth_2d,
    discover_rings,
    roi_mask,
    vertical_angles,
)

F32 = np.float32


class TestRoi:
    def test_box_and_zero_drop(self):
        cfg = FilterConfig()
        pts = np.array([
            [1.0, 0.0, -2.0, 0],     # inside
            [0.0, 0.0, 0.0, 0],      # zero point -> dropped
            [-1.0, 0.0, -2.0, 0],    # x < min_x
            [31.0, 0.0, -2.0, 0],    # x > max_x
            [1.0, -11.0, -2.0, 0],   # y < min_y
            [1.0, 0.0, -0.5, 0],     # z > max_z
            [2.0, -1.0, 3.0 - 1.0, 0],  # x+y+z == 0? 2-1+2 = 3 != 0 -> kept? z=2 > max_z
            [30.0, 10.0, -1.0, 0],   # corners inclusive
        ], dtype=F32)
        m = roi_mask(pts, cfg)
        assert m.tolist() == [True, False, False, False, False, False, False, True]

    def test_sum_zero_nonorigin_dropped(self):
        # The reference drops on x+y+z == 0, not just the origin
        # (lidar_segmentation.cpp:111).
        cfg = FilterConfig()
        pts = np.array([[3.0, -1.0, -2.0, 0.0]], dtype=F32)  # sums to 0, inside box
        assert roi_mask(pts, cfg).tolist() == [False]

    def test_under_30_points_not_ok(self):
        pts = np.tile(np.array([[1.0, 0.0, -2.0, 0.0]], dtype=F32), (29, 1))
        res = run_oracle(pts)
        assert not res.ok


class TestAngles:
    def test_vertical_angle_hemispheres(self):
        x = np.array([1.0, 1.0], F32)
        y = np.zeros(2, F32)
        z = np.array([-1.0, 1.0], F32)
        _, a = vertical_angles(x, y, z)
        # z<0: acos(|z|/d) = acos(1/sqrt2) = 45 deg; z>0: asin + 90 = 135 deg
        np.testing.assert_allclose(a, [45.0, 135.0], atol=1e-4)

    def test_azimuth_quadrants(self):
        x = np.array([1.0, 1.0, -1.0, -1.0], F32)
        y = np.array([-1.0, 1.0, 1.0, -1.0], F32)
        _, a = azimuth_2d(x, y)
        np.testing.assert_allclose(a, [45.0, 135.0, 225.0, 315.0], atol=1e-4)

    def test_azimuth_axis_boundaries(self):
        # Sign-boundary cases (lidar_segmentation.cpp:254-269).
        x = np.array([1.0, 0.0, -1.0, 0.0], F32)
        y = np.array([0.0, 1.0, 0.0, -1.0], F32)
        _, a = azimuth_2d(x, y)
        # x>0,y=0 -> first branch asin(1)=90; x=0,y>0 -> 180-0=180;
        # x<0,y=0 -> 180+90=270; x=0,y<0 -> first branch (y<=0): 0
        np.testing.assert_allclose(a, [90.0, 180.0, 270.0, 0.0], atol=1e-4)


class TestRingDiscovery:
    def test_greedy_registration_order_independent_bins(self):
        # Three well-separated rings.
        alpha = np.array([10.0, 10.05, 20.0, 10.1, 30.0, 20.1], F32)
        reps = discover_rings(alpha, 0.18)
        np.testing.assert_allclose(reps, [10.0, 20.0, 30.0])

    def test_tolerance_chain_first_wins(self):
        # 10.0 registers; 10.15 matches (within 0.18); 10.30 does NOT match
        # 10.0 -> registers a second ring.  Greedy, not transitive clustering.
        alpha = np.array([10.0, 10.15, 10.30], F32)
        reps = discover_rings(alpha, 0.18)
        np.testing.assert_allclose(reps, [10.0, 10.30])

    def test_cap_at_64(self):
        alpha = np.linspace(1, 170, 200).astype(F32)  # all >0.18 apart
        reps = discover_rings(alpha, 0.18)
        assert reps.shape[0] == 64


def single_ring_scan(z_profile, elev_deg=-10.0, az_lo=0.05, az_hi=0.6):
    """One laser ring: fixed elevation angle, azimuth sweep, range chosen so
    each return lands at the requested z.  All points share one vertical
    angle -> one reference ring; input order == azimuth order."""
    z = np.asarray(z_profile, np.float64)
    n = z.shape[0]
    e = np.deg2rad(elev_deg)
    t = z / np.sin(e)  # both negative -> positive range
    az = np.linspace(az_lo, az_hi, n)
    x = t * np.cos(e) * np.cos(az)
    y = t * np.cos(e) * np.sin(az)
    return np.stack([x, y, z, np.zeros(n)], -1).astype(F32)


class TestXZero:
    CFG = dict(z_zero_method=False, star_shaped_method=False,
               blind_spots=False, min_z=-3, max_z=0)

    def test_step_marks_curb(self):
        cfg = FilterConfig(**self.CFG)
        z = np.full(40, -1.8)
        z[20:] = -1.6  # 20 cm curb step
        res = run_oracle(single_ring_scan(z), cfg)
        assert res.ok and res.num_rings == 1
        marked = np.flatnonzero(res.labels == LABEL_CURB)
        assert marked.size > 0
        assert marked.min() >= 15 and marked.max() <= 25  # near the step

    def test_flat_marks_nothing(self):
        cfg = FilterConfig(**self.CFG)
        res = run_oracle(single_ring_scan(np.full(40, -1.8)), cfg)
        assert not np.any(res.labels == LABEL_CURB)

    def test_far_apart_points_ignored(self):
        # The d < 5 m gate (x_zero_method.cpp:40): same step but points
        # spread over a huge arc -> no marks.
        cfg = FilterConfig(**self.CFG)
        z = np.full(40, -1.8)
        z[20:] = -1.6
        pts = single_ring_scan(z, elev_deg=-2.0, az_lo=0.0, az_hi=6.0)
        pts = pts[np.abs(pts).sum(1) > 0]
        res = run_oracle(pts, FilterConfig(z_zero_method=False,
                                           star_shaped_method=False,
                                           blind_spots=False,
                                           min_z=-60, max_z=0, min_x=-200,
                                           max_x=200, min_y=-200, max_y=200))
        if res.ok:
            assert not np.any(res.labels == LABEL_CURB)


class TestZZero:
    CFG = dict(x_zero_method=False, star_shaped_method=False,
               blind_spots=False, min_z=-3, max_z=0)

    def test_step_marks_curb(self):
        cfg = FilterConfig(**self.CFG)
        z = np.full(40, -1.8)
        z[20:] = -1.6  # radial jump -> xy corner + |z| max difference
        res = run_oracle(single_ring_scan(z), cfg)
        assert res.ok and res.num_rings == 1
        marked = np.flatnonzero(res.labels == LABEL_CURB)
        assert marked.size > 0
        assert marked.min() >= 15 and marked.max() <= 25

    def test_flat_marks_nothing(self):
        cfg = FilterConfig(**self.CFG)
        res = run_oracle(single_ring_scan(np.full(40, -1.8)), cfg)
        assert not np.any(res.labels == LABEL_CURB)


class TestEndToEnd:
    @pytest.mark.parametrize("scene", sorted(SCENES))
    def test_scene_runs_and_labels_valid(self, scene, scene_scans):
        res = run_oracle(scene_scans[scene])
        assert res.ok
        assert set(np.unique(res.labels)) <= {LABEL_NONE, LABEL_ROAD, LABEL_CURB}
        assert res.num_rings > 0
        # marker flags binary
        if len(res.marker_points):
            assert set(np.unique(res.marker_points[:, 3])) <= {0.0, 1.0}

    def test_two_curbs_geometry(self, scene_scans):
        pts = scene_scans["two_curbs"]
        res = run_oracle(pts)
        roi = pts[res.roi_mask]
        curb = roi[res.labels == LABEL_CURB]
        road = roi[res.labels == LABEL_ROAD]
        assert curb.shape[0] > 20 and road.shape[0] > 200
        # Curb points concentrated at |y| ~ 3.5.
        frac_at_curb = np.mean((np.abs(curb[:, 1]) > 2.8) & (np.abs(curb[:, 1]) < 4.4))
        assert frac_at_curb > 0.9
        # Road stays mostly between the curbs (the 1-degree flood-fill beams
        # can leak through gaps between sparse curb samples at range —
        # faithful reference behavior).
        assert np.mean(np.abs(road[:, 1]) < 3.7) > 0.85

    def test_flat_scene_floods_to_road(self, scene_scans):
        res = run_oracle(scene_scans["flat"])
        frac_road = np.mean(res.labels == LABEL_ROAD)
        assert frac_road > 0.95

    def test_road_blocked_by_curbs(self, scene_scans):
        # Denser curbs (taller => marked on more rings) must block the flood
        # fill: compare road leakage past the curb line vs the flat scene.
        pts = scene_scans["high_curbs"]
        res = run_oracle(pts)
        roi = pts[res.roi_mask]
        road = roi[res.labels == LABEL_ROAD]
        leak = np.mean(np.abs(road[:, 1]) > 4.5)
        assert leak < 0.1

    def test_blind_spot_gating_reduces_road(self, scene_scans):
        pts = scene_scans["blind_spot"]
        with_bs = run_oracle(pts, FilterConfig(blind_spots=True))
        without = run_oracle(pts, FilterConfig(blind_spots=False))
        assert np.sum(with_bs.labels == LABEL_ROAD) <= np.sum(without.labels == LABEL_ROAD)

    def test_fuzz_random_points_no_crash(self):
        for seed in range(3):
            res = run_oracle(random_scan(4000, seed=seed))
            assert res.ok
            assert set(np.unique(res.labels)) <= {0, 1, 2}

    def test_method_toggles(self, scene_scans):
        pts = scene_scans["two_curbs"]
        all_off = run_oracle(pts, FilterConfig(
            x_zero_method=False, z_zero_method=False, star_shaped_method=False))
        # No detectors -> no curb points; floods (almost) everything to road.
        assert not np.any(all_off.labels == LABEL_CURB)

    def test_probably_road_is_ring_10(self, scene_scans):
        res = run_oracle(scene_scans["two_curbs"])
        if res.num_rings > 10:
            assert np.array_equal(
                np.sort(res.probably_road_ids),
                np.sort(res.ring_point_ids[10]))
