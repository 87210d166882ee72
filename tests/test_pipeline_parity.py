"""Golden-label parity: JAX pipeline vs the NumPy oracle
(SURVEY.md section 4, item 1 — the BASELINE north-star check)."""

import numpy as np
import pytest

from conftest import assert_label_parity
from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan, random_scan
from urban_road_filter_tpu.oracle import run_oracle
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit

DIMS = PipelineDims(max_points=16384, rings=64, ring_capacity=1024,
                    beam_capacity=256)


def run_both(points, cfg=None, dims=DIMS):
    cfg = cfg or FilterConfig()
    oracle = run_oracle(points, cfg)
    jx = process_scan_jit(pad_scan(points, dims.max_points), cfg, dims)
    return oracle, jx


def labels_on_roi(points, oracle, jx, dims=DIMS):
    """Oracle labels and JAX labels, both on ROI points in input order."""
    n_in = len(points)
    jl = np.asarray(jx.labels)[:n_in]
    roi = np.asarray(oracle.roi_mask)
    return oracle.labels, jl[roi]


class TestParityScenes:
    @pytest.mark.parametrize("scene", sorted(SCENES))
    def test_full_pipeline_parity(self, scene, scene_scans):
        pts = scene_scans[scene]
        oracle, jx = run_both(pts)
        assert bool(jx.ok) == oracle.ok
        want, got = labels_on_roi(pts, oracle, jx)
        assert int(jx.overflow) == 0
        assert int(jx.num_rings) == oracle.num_rings
        assert_label_parity(got, want, 0.999, f"{scene} labels")

    @pytest.mark.parametrize("scene", ["two_curbs", "blind_spot"])
    def test_marker_parity(self, scene, scene_scans):
        from conftest import assert_marker_rows, marker_rows_boundary_ok
        from urban_road_filter_tpu.ops.markers import compact_markers

        pts = scene_scans[scene]
        oracle, jx = run_both(pts)
        rows, bins = compact_markers(jx.markers)
        # Bins exact; every NON-boundary row exact (the former >=97%
        # tolerance could hide real winner bugs — VERDICT r2 item 8).
        assert np.array_equal(bins, oracle.marker_bins)
        assert_marker_rows(rows, oracle.marker_points, f"{scene} markers")
        flags_differ = rows[:, 3] != oracle.marker_points[:, 3]
        assert not flags_differ.any() or marker_rows_boundary_ok(
            rows[:, :3], oracle.marker_points[:, :3])[flags_differ].all()


class TestParityConfigs:
    @pytest.mark.parametrize("kw", [
        dict(x_zero_method=False),
        dict(z_zero_method=False),
        dict(star_shaped_method=False),
        dict(blind_spots=False),
        dict(x_direction=1),
        dict(x_direction=2),
        dict(beam_zone=10.0),
        dict(beam_zone=45.5),   # non-integral: no exact-equality special case
        dict(curb_points=3),
        dict(curb_points=10),
        dict(curb_height=0.12),
        dict(interval=0.5),
        dict(starbeam_filter=True),
    ])
    def test_config_variants(self, kw, scene_scans):
        cfg = FilterConfig(**kw)
        pts = scene_scans["two_curbs"]
        oracle, jx = run_both(pts, cfg)
        want, got = labels_on_roi(pts, oracle, jx)
        assert_label_parity(got, want, 0.999, f"{kw} labels")


class TestParityFuzz:
    @pytest.mark.parametrize("seed", range(4))
    def test_random_clouds(self, seed):
        pts = random_scan(6000, seed=seed)
        oracle, jx = run_both(pts)
        want, got = labels_on_roi(pts, oracle, jx)
        # Random clouds hammer boundary cases; slightly looser bar.
        assert_label_parity(got, want, 0.995, f"fuzz{seed} labels")


class TestStructure:
    def test_under_30_points_gated(self):
        pts = np.tile(np.float32([[1, 0, -2, 0]]), (10, 1))
        jx = process_scan_jit(pad_scan(pts, DIMS.max_points), FilterConfig(), DIMS)
        assert not bool(jx.ok)
        assert not np.asarray(jx.labels).any()

    def test_probably_road_matches_oracle(self, scene_scans):
        pts = scene_scans["two_curbs"]
        oracle, jx = run_both(pts)
        got = np.flatnonzero(np.asarray(jx.probably_road)[:len(pts)][oracle.roi_mask])
        assert np.array_equal(np.sort(got), np.sort(oracle.probably_road_ids))

    @pytest.mark.parametrize("ring", [0, 3])
    def test_probably_road_ring_knob(self, ring, scene_scans):
        """cfg.probably_road_ring redirects the road_probably dump (VERDICT r2
        missing #5; the reference hardcodes 10, lidar_segmentation.cpp:605)."""
        cfg = FilterConfig(probably_road_ring=ring)
        pts = scene_scans["two_curbs"]
        oracle, jx = run_both(pts, cfg)
        got = np.flatnonzero(
            np.asarray(jx.probably_road)[:len(pts)][oracle.roi_mask])
        assert len(got) > 0  # low rings are populated in this scene
        assert np.array_equal(np.sort(got), np.sort(oracle.probably_road_ids))

    def test_ring_assignment_matches(self, scene_scans):
        pts = scene_scans["wall"]
        oracle, jx = run_both(pts)
        got = np.asarray(jx.ring_id)[:len(pts)][oracle.roi_mask]
        want = np.where(oracle.ring_of_point < 0, 64, oracle.ring_of_point)
        assert np.mean(got == want) > 0.9999
