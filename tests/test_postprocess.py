"""Tests for host-side marker assembly (reference L5 semantics)."""

import numpy as np

from urban_road_filter_tpu.postprocess import (
    MarkerTracker,
    build_line_strips,
    rdp,
    smooth_marker_flags,
)


class TestSmoothing:
    def test_endpoint_pairing(self):
        # green,red,... -> first point joins red (lidar_segmentation.cpp:381).
        f = smooth_marker_flags(np.array([0, 1, 1, 1]))
        assert f[0] == 1
        # red,green,... -> first joins green (cpp:391).
        f = smooth_marker_flags(np.array([1, 0, 0, 0]))
        assert f[0] == 0
        # ...red,green(last) -> last joins red? No: last green w/ 2nd-last red -> red.
        f = smooth_marker_flags(np.array([1, 1, 1, 0]))
        assert f[-1] == 1

    def test_isolated_singletons_flipped(self):
        f = smooth_marker_flags(np.array([1, 1, 0, 1, 1, 1]))
        assert f.tolist() == [1, 1, 1, 1, 1, 1]
        f = smooth_marker_flags(np.array([0, 0, 1, 0, 0, 0]))
        assert f.tolist() == [0, 0, 0, 0, 0, 0]

    def test_sequential_pass_semantics(self):
        # Pass 1 (green->red) runs fully before pass 2; within a pass earlier
        # flips are visible to later indices.
        f = smooth_marker_flags(np.array([1, 1, 0, 1, 0, 1, 1]))
        # i=2: 0 with 1,1 neighbors -> 1; i=3 stays 1; i=4: 0 with f[3]=1, f[5]=1 -> 1
        assert f.tolist() == [1, 1, 1, 1, 1, 1, 1]


class TestRdp:
    def test_collinear_collapse(self):
        pts = np.stack([np.arange(10.0), np.zeros(10)], -1)
        out = rdp(pts, 0.1)
        assert out.shape[0] == 2

    def test_keeps_corner(self):
        pts = np.array([[0, 0], [1, 0], [2, 0], [2, 1], [2, 2]], float)
        out = rdp(pts, 0.1)
        assert [2.0, 0.0] in out.tolist()

    def test_small_inputs_unchanged(self):
        pts = np.array([[0, 0], [1, 1]], float)
        assert rdp(pts, 0.5).shape[0] == 2


class TestStrips:
    def _markers(self, flags, z=-1.6):
        n = len(flags)
        x = np.linspace(1, 5, n)
        return np.stack([x, x * 0.5, np.full(n, z), np.asarray(flags, float)], -1)

    def test_single_color_single_strip(self):
        strips, _ = build_line_strips(self._markers([0, 0, 0, 0]), polysimp_allow=False)
        assert len(strips) == 1 and strips[0].color == "green"

    def test_transition_shares_boundary_points(self):
        m = self._markers([0, 0, 1, 1])
        strips, _ = build_line_strips(m, polysimp_allow=False, zavg_allow=False)
        assert [s.color for s in strips] == ["green", "red"]
        # green -> red: red strip starts at the previous (green) point.
        np.testing.assert_allclose(strips[1].points[0], m[1, :3])

    def test_red_to_green_transition(self):
        m = self._markers([1, 1, 0, 0])
        strips, _ = build_line_strips(m, polysimp_allow=False, zavg_allow=False)
        assert [s.color for s in strips] == ["red", "green"]
        # the transition point belongs to both strips
        np.testing.assert_allclose(strips[0].points[-1], m[2, :3])
        np.testing.assert_allclose(strips[1].points[0], m[2, :3])

    def test_cm_leq_2_no_strips(self):
        assert build_line_strips(self._markers([0, 0])) == ([], 0)

    def test_zavg_overwrites_z(self):
        m = self._markers([0, 0, 0, 0])
        m[:, 2] = [-1.0, -2.0, -1.0, -2.0]
        strips, _ = build_line_strips(m, polysimp_allow=False, zavg_allow=True)
        np.testing.assert_allclose(strips[0].points[:, 2], -1.5, atol=1e-6)

    def test_polysimp_sets_polyz(self):
        strips, _ = build_line_strips(self._markers([0, 0, 0, 0]),
                                      polysimp_allow=True, polyz=-1.25, zavg_allow=False)
        np.testing.assert_allclose(strips[0].points[:, 2], -1.25)


class TestGhosts:
    def test_delete_emitted_for_stale_ids(self):
        t = MarkerTracker()
        m4 = np.stack([np.arange(8.0), np.zeros(8), np.zeros(8),
                       np.array([0, 0, 1, 1, 0, 0, 1, 1.0])], -1)
        strips, lid = build_line_strips(m4, polysimp_allow=False)
        out1 = t.finalize(strips, lid)
        assert t.ghostcount == lid == strips[-1].id
        # Next scan has fewer strips -> DELETEs for the stale ids.
        m1 = np.stack([np.arange(4.0), np.zeros(4), np.zeros(4), np.zeros(4)], -1)
        strips2, lid2 = build_line_strips(m1, polysimp_allow=False)
        out2 = t.finalize(strips2, lid2)
        dels = [s for s in out2 if s.action == "delete"]
        assert {s.id for s in dels} == set(range(strips2[-1].id + 1, strips[-1].id + 1))
