"""Oracle-vs-real-C++ validation (SURVEY.md section 4, test plan item 1).

Compiles the reference's four algorithm files verbatim (tools/golden) and
runs them stage-by-stage on the synthetic scenes, comparing against the
NumPy oracle's corresponding stages.  Expected agreement is ~100%:
documented divergences (PARITY.md items 1-2: stable-vs-unstable sort tie
order, f64-rounded windowed sums) are measure-zero-to-rare, so the gate is
>=99.9% per stage with exactness tracked in the assert message.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools/golden")

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.oracle import reference as oracle

try:
    import runner

    BINARY = runner.build()
    FULL_BINARY = runner.build_full()
except Exception as e:  # toolchain/reference missing -> skip below
    BINARY = None
    FULL_BINARY = None
    _BUILD_ERR = e

F32 = np.float32

pytestmark = [
    pytest.mark.slow,  # compiles + replays the reference C++
    pytest.mark.skipif(BINARY is None,
                       reason="g++ or /root/reference unavailable"),
]


def _roi_points(scene_scans, name, cfg):
    pts = scene_scans[name].astype(F32)
    keep = oracle.roi_mask(pts, cfg)
    p = pts[keep]
    return p[:, 0].astype(F32), p[:, 1].astype(F32), p[:, 2].astype(F32)


def _agree(a, b, what, min_agree=0.999):
    a = np.concatenate([np.asarray(r).ravel() for r in a]) if isinstance(a, list) else np.asarray(a)
    b = np.concatenate([np.asarray(r).ravel() for r in b]) if isinstance(b, list) else np.asarray(b)
    assert a.shape == b.shape
    agree = float(np.mean(a == b)) if a.size else 1.0
    assert agree >= min_agree, (
        f"{what}: C++-vs-oracle agreement {agree:.6f} "
        f"({int(np.sum(a != b))}/{a.size} differ)")
    return agree


def _rings_pre_sort(x, y, z, labels_star, cfg):
    """Mirror run_oracle's ring wiring (oracle/reference.py:497-525) to
    produce the array3D inputs of the x/z-zero stage."""
    _, alpha_v = oracle.vertical_angles(x, y, z)
    reps = oracle.discover_rings(alpha_v, cfg.interval)
    angles = np.sort(reps)
    match = np.abs(angles[None, :] - alpha_v[:, None]) <= F32(cfg.interval)
    has = match.any(axis=1)
    ring_of = np.where(has, match.argmax(axis=1), -1)
    d2, alpha_a = oracle.azimuth_2d(x, y)
    rx, ry, rz, ra, rl = [], [], [], [], []
    maxd = np.zeros(max(len(angles), 1), F32)
    for k in range(len(angles)):
        ids = np.flatnonzero(ring_of == k)
        rx.append(x[ids].copy())
        ry.append(y[ids].copy())
        rz.append(z[ids].copy())
        ra.append(alpha_a[ids].copy())
        rl.append(labels_star[ids].astype(np.int32).copy())
        if ids.size:
            maxd[k] = d2[ids].max()
    return rx, ry, rz, ra, rl, maxd


SCENES_TO_CHECK = ("two_curbs", "blind_spot", "wall", "flat", "curb_gap")


@pytest.mark.parametrize("scene", SCENES_TO_CHECK)
def test_star_stage_matches_cpp(scene, scene_scans):
    cfg = FilterConfig()
    x, y, z = _roi_points(scene_scans, scene, cfg)
    got = runner.star(BINARY, x, y, z, cfg)
    want = np.zeros(x.shape[0], np.int16)
    oracle.star_shaped_search(x, y, z, want, cfg)
    _agree(got, want.astype(np.int64), f"star[{scene}]")
    assert (np.asarray(got) == 2).sum() > 0 or scene == "flat"


@pytest.mark.parametrize("scene", SCENES_TO_CHECK)
def test_xz_stage_matches_cpp(scene, scene_scans):
    cfg = FilterConfig()
    x, y, z = _roi_points(scene_scans, scene, cfg)
    star_l = np.zeros(x.shape[0], np.int16)
    oracle.star_shaped_search(x, y, z, star_l, cfg)
    rx, ry, rz, _, rl, _ = _rings_pre_sort(x, y, z, star_l, cfg)

    got = runner.xz(BINARY, rx, ry, rz, rl, cfg)

    want = [r.copy() for r in rl]
    for k in range(len(rx)):
        w16 = want[k].astype(np.int16)
        oracle._x_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        oracle._z_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        want[k] = w16.astype(np.int32)
    _agree(got, want, f"xz[{scene}]")


@pytest.mark.parametrize("scene", SCENES_TO_CHECK)
def test_blind_stage_matches_cpp(scene, scene_scans):
    cfg = FilterConfig()
    x, y, z = _roi_points(scene_scans, scene, cfg)
    star_l = np.zeros(x.shape[0], np.int16)
    oracle.star_shaped_search(x, y, z, star_l, cfg)
    rx, ry, rz, ra, rl, maxd = _rings_pre_sort(x, y, z, star_l, cfg)
    index = len(rx)
    for k in range(index):
        w16 = rl[k].astype(np.int16)
        oracle._x_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        oracle._z_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        rl[k] = w16
    # Azimuth sort between the stencil and flood-fill stages (the oracle's
    # stable sort stands in for the reference's unstable quicksort —
    # PARITY.md item 1; both backends then see the SAME sorted input).
    ra_s, rl_s = [], []
    for k in range(index):
        srt = np.argsort(ra[k], kind="stable")
        ra_s.append(ra[k][srt])
        rl_s.append(rl[k][srt])

    got = runner.blind(BINARY, ra_s, [r.astype(np.int32) for r in rl_s],
                       maxd, cfg)

    want = [r.copy() for r in rl_s]
    oracle._blind_spots(ra_s, want, index, maxd, cfg)
    _agree(got, [w.astype(np.int32) for w in want], f"blind[{scene}]")


class TestFullPipeline:
    """End-to-end Detector::filtered vs run_oracle (VERDICT r2 item 1: ring
    discovery, arc build, azimuth quadrants and the marker search previously
    had no C++ ground truth — this drives the whole node)."""

    def _run_pair(self, pts, cfg):
        from urban_road_filter_tpu.oracle import run_oracle

        res = runner.full(FULL_BINARY, [pts], cfg)[0]
        o = run_oracle(pts, cfg)
        return res, o

    @staticmethod
    def _label_map(n, road, curb):
        m = np.zeros(n, np.int8)
        m[road] = 1
        m[curb] = 2
        return m

    @pytest.mark.parametrize("scene", SCENES_TO_CHECK)
    def test_clouds_match_oracle(self, scene, scene_scans):
        cfg = FilterConfig()
        pts = scene_scans[scene]
        res, o = self._run_pair(pts, cfg)
        assert res.published == o.ok
        if not o.ok:
            return
        roi_ids = np.flatnonzero(o.roi_mask)
        # ROI cloud: exact ids in input order (ConditionalRemoval preserves
        # order; lidar_segmentation.cpp:106-121).
        assert np.array_equal(res.roi_ids, roi_ids)
        # road_probably: the verbatim ring dump (cpp:605-608).
        assert np.array_equal(res.probably_ids, roi_ids[o.probably_road_ids])
        # Per-point labels: C++ publish order may differ on azimuth ties
        # (unstable quicksort, PARITY.md item 1) — compare label MAPS.
        got = self._label_map(len(pts), res.road_ids, res.curb_ids)
        want = self._label_map(len(pts), roi_ids[o.road_ids],
                               roi_ids[o.curb_ids])
        agree = float(np.mean(got == want))
        assert agree >= 0.999, f"{scene}: label map agreement {agree:.5f}"

    @pytest.mark.parametrize("scene", ["two_curbs", "blind_spot"])
    def test_markers_match_postprocess(self, scene, scene_scans):
        """The C++ marker array (search + smoothing + strips + RDP + zavg)
        vs the oracle's marker rows fed through our postprocess — exact
        strip structure, colors and ids; coordinates to f32 rounding."""
        from urban_road_filter_tpu.postprocess import (
            build_line_strips, smooth_marker_flags)

        cfg = FilterConfig()
        pts = scene_scans[scene]
        res, o = self._run_pair(pts, cfg)
        rows = o.marker_points.copy()
        assert len(rows) > 2
        rows[:, 3] = smooth_marker_flags(rows[:, 3])
        strips, _ = build_line_strips(
            rows, polysimp_allow=cfg.simple_poly_allow,
            polysimp=cfg.poly_s_param, polyz=cfg.poly_z_manual,
            zavg_allow=cfg.poly_z_avg_allow)
        assert len(strips) == len(res.markers)
        for s, m in zip(strips, res.markers):
            assert s.id == m["id"]
            assert (s.color == "red") == m["red"]
            assert m["action"] == "add"
            assert len(s.points) == len(m["points"])
            # f32 (ours) vs f64-holding-f32 (ROS msg): tiny quantization.
            assert np.max(np.abs(s.points - m["points"])) < 1e-4

    @pytest.mark.parametrize("kw", [
        dict(),
        dict(beam_zone=45.5),
        dict(starbeam_filter=True),
        dict(x_direction=1),
        dict(curb_points=3),
        dict(simple_poly_allow=False),
        dict(poly_z_avg_allow=False, poly_z_manual=-2.0),
    ])
    def test_config_variants_label_maps(self, kw, scene_scans):
        cfg = FilterConfig(**kw)
        pts = scene_scans["two_curbs"]
        res, o = self._run_pair(pts, cfg)
        roi_ids = np.flatnonzero(o.roi_mask)
        got = self._label_map(len(pts), res.road_ids, res.curb_ids)
        want = self._label_map(len(pts), roi_ids[o.road_ids],
                               roi_ids[o.curb_ids])
        agree = float(np.mean(got == want))
        assert agree >= 0.999, f"{kw}: label map agreement {agree:.5f}"

    def test_ghost_delete_across_scans(self, scene_scans):
        """ghostcount persists across scans in one process: a scan with
        fewer strips than the previous one must publish DELETE markers with
        the exact id range (lidar_segmentation.cpp:23,591-598) — compared
        against MarkerTracker on the oracle's rows."""
        from urban_road_filter_tpu.oracle import run_oracle
        from urban_road_filter_tpu.postprocess import (
            MarkerTracker, build_line_strips, smooth_marker_flags)

        cfg = FilterConfig()
        many = scene_scans["blind_spot"]  # several strips
        few = scene_scans["flat"]  # fewer strips
        seq = [many, few]
        res = runner.full(FULL_BINARY, seq, cfg)
        tracker = MarkerTracker()
        for r, pts in zip(res, seq):
            o = run_oracle(pts, cfg)
            rows = o.marker_points.copy()
            if len(rows) <= 2:
                assert not r.markers
                continue
            rows[:, 3] = smooth_marker_flags(rows[:, 3])
            strips, lsid = build_line_strips(
                rows, polysimp_allow=cfg.simple_poly_allow,
                polysimp=cfg.poly_s_param, polyz=cfg.poly_z_manual,
                zavg_allow=cfg.poly_z_avg_allow)
            strips = tracker.finalize(strips, lsid)
            assert [s.action for s in strips] == [m["action"]
                                                  for m in r.markers]
            assert [s.id for s in strips] == [m["id"] for m in r.markers]


def test_blind_stage_x_direction_variants(scene_scans):
    # The three xDirection gate shapes (blind_spots.cpp:75-99).
    x, y, z = _roi_points(scene_scans, "blind_spot", FilterConfig())
    for xdir in (0, 1, 2):
        cfg = FilterConfig(x_direction=xdir)
        star_l = np.zeros(x.shape[0], np.int16)
        oracle.star_shaped_search(x, y, z, star_l, cfg)
        rx, ry, rz, ra, rl, maxd = _rings_pre_sort(x, y, z, star_l, cfg)
        ra_s, rl_s = [], []
        for k in range(len(rx)):
            srt = np.argsort(ra[k], kind="stable")
            ra_s.append(ra[k][srt])
            rl_s.append(rl[k][srt].astype(np.int16))
        got = runner.blind(BINARY, ra_s, [r.astype(np.int32) for r in rl_s],
                           maxd, cfg)
        want = [r.copy() for r in rl_s]
        oracle._blind_spots(ra_s, want, len(rx), maxd, cfg)
        _agree(got, [w.astype(np.int32) for w in want], f"blind[xdir={xdir}]")
