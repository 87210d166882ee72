"""Property tests (SURVEY.md section 4, item 3): label domain, determinism,
input-order semantics, and cross-implementation agreement."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan, random_scan
from urban_road_filter_tpu.oracle import run_oracle
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit

DIMS = PipelineDims(max_points=8192, rings=64, ring_capacity=1024,
                    beam_capacity=256)


def run(points, cfg=None, dims=DIMS):
    cfg = cfg or FilterConfig()
    return process_scan_jit(jax.numpy.asarray(pad_scan(points, dims.max_points)),
                            cfg, dims)


class TestDeterminism:
    def test_same_input_same_output(self, scene_scans):
        pts = scene_scans["two_curbs"][:6000]
        a = run(pts)
        b = run(pts)
        np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(b.labels))
        np.testing.assert_array_equal(np.asarray(a.markers), np.asarray(b.markers))

    def test_input_order_dependence_is_shared_with_oracle(self):
        """The reference is NOT permutation invariant (greedy ring discovery
        + pre-sort stencils).  Our determinism contract: for any fixed
        input order, pipeline and oracle agree — including shuffled orders."""
        pts = make_scan(SCENES["two_curbs"](), n_rings=16, n_azimuth=256,
                        seed=9)
        rng = np.random.default_rng(0)
        shuffled = pts[rng.permutation(len(pts))]
        oracle = run_oracle(shuffled)
        jx = run(shuffled)
        got = np.asarray(jx.labels)[:len(shuffled)][oracle.roi_mask]
        agree = np.mean(got == oracle.labels)
        assert agree >= 0.999, f"shuffled-input parity {agree:.5f}"


class TestDomains:
    @pytest.mark.parametrize("seed", range(2))
    def test_labels_domain_and_gating(self, seed):
        pts = random_scan(3000, seed=seed)
        out = run(pts)
        labels = np.asarray(out.labels)
        assert set(np.unique(labels)) <= {0, 1, 2}
        # non-ROI points (incl. padding) must stay unlabeled
        roi = np.asarray(out.roi)
        assert not labels[~roi].any()

    def test_counts_are_consistent(self, scene_scans):
        pts = scene_scans["flat"]
        out = run(pts)
        counts = np.asarray(out.counts)
        ring_id = np.asarray(out.ring_id)[:len(pts)]
        n_assigned = int((ring_id < 64).sum())
        assert counts.sum() + int(out.overflow) == n_assigned

    def test_markers_red_flag_binary(self, scene_scans):
        out = run(scene_scans["two_curbs"])
        m = np.asarray(out.markers)
        assert set(np.unique(m[:, 4])) <= {0.0, 1.0}
        # existing markers have plausible coordinates inside the ROI box
        sel = m[:, 0] > 0
        assert np.all(np.abs(m[sel][:, 1:3]) < 200)
