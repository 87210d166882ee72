"""Stage-level unit tests for individual device ops vs the oracle
(SURVEY.md section 4, item 2)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan, random_scan
from urban_road_filter_tpu.ops import geometry
from urban_road_filter_tpu.ops.blind_spots import _gate, _quadrant_extremes
from urban_road_filter_tpu.ops.star import star_shaped
from urban_road_filter_tpu.oracle import reference as oracle

F32 = np.float32


def roi_points(scene="two_curbs", seed=0, n=5000):
    pts = make_scan(SCENES[scene](), n_rings=24, n_azimuth=256, seed=seed)
    keep = oracle.roi_mask(pts, FilterConfig())
    return pts[keep][:n]


class TestGeometryStages:
    def test_roi_mask_matches_oracle(self):
        cfg = FilterConfig()
        pts = random_scan(4000, seed=1)
        want = oracle.roi_mask(pts, cfg)
        got = np.asarray(geometry.roi_mask(jnp.asarray(pts), cfg))
        assert np.array_equal(got, want)

    def test_vertical_angles_close(self):
        pts = roi_points()
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        _, want = oracle.vertical_angles(x, y, z)
        _, got = geometry.vertical_angles(jnp.asarray(x), jnp.asarray(y),
                                          jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4)

    def test_azimuth_close(self):
        pts = roi_points()
        _, want = oracle.azimuth_2d(pts[:, 0], pts[:, 1])
        _, got = geometry.azimuth_2d(jnp.asarray(pts[:, 0]), jnp.asarray(pts[:, 1]))
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)

    def test_ring_discovery_matches_oracle(self):
        cfg = FilterConfig()
        pts = roi_points()
        _, alpha = oracle.vertical_angles(pts[:, 0], pts[:, 1], pts[:, 2])
        want = np.sort(oracle.discover_rings(alpha, cfg.interval))
        got, count = geometry.discover_rings(
            jnp.asarray(alpha), jnp.ones(len(alpha), bool), cfg.interval)
        got = np.asarray(got)[:int(count)]
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_tensorize_preserves_input_order(self):
        # Points of one ring must land in slots in input order.
        n = 64
        ring_id = jnp.asarray(np.zeros(n, np.int32))
        vals = jnp.asarray(np.arange(n, dtype=np.float32))
        lay, pos = geometry.tensorize(vals, vals, vals, ring_id, 128)
        got = np.asarray(lay.x[0, :n])
        np.testing.assert_array_equal(got, np.arange(n))
        np.testing.assert_array_equal(np.asarray(pos), np.arange(n))
        assert int(lay.counts[0]) == n
        assert int(lay.overflow) == 0

    def test_tensorize_overflow_counted(self):
        n = 64
        ring_id = jnp.zeros(n, jnp.int32)
        vals = jnp.ones(n, jnp.float32)
        lay, _ = geometry.tensorize(vals, vals, vals, ring_id, 16)
        assert int(lay.counts[0]) == 16
        assert int(lay.overflow) == n - 16

    def test_tensorize_optional_fields(self):
        n = 32
        ring_id = jnp.zeros(n, jnp.int32)
        vals = jnp.asarray(np.arange(n, dtype=np.float32))
        lbl = jnp.asarray((np.arange(n) % 3).astype(np.int32))
        lay, _ = geometry.tensorize(vals, vals, vals, ring_id, 64,
                                    label=lbl, with_pid=True)
        np.testing.assert_array_equal(np.asarray(lay.label[0, :n]),
                                      np.arange(n) % 3)
        np.testing.assert_array_equal(np.asarray(lay.pid[0, :n]), np.arange(n))
        assert int(lay.pid[0, n]) == -1  # empty slot sentinel
        # Defaults: label zeros, pid -1.
        lay2, _ = geometry.tensorize(vals, vals, vals, ring_id, 64)
        assert int(np.asarray(lay2.label).max()) == 0
        assert int(np.asarray(lay2.pid).max()) == -1


class TestStarStage:
    @pytest.mark.parametrize("scene", ["two_curbs", "wall"])
    def test_star_marks_match_oracle(self, scene):
        cfg = FilterConfig()
        pts = roi_points(scene)
        want = np.zeros(len(pts), np.int16)
        oracle.star_shaped_search(pts[:, 0].astype(F32), pts[:, 1].astype(F32),
                                  pts[:, 2].astype(F32), want, cfg)
        got_lbl, star_of = star_shaped(
            jnp.asarray(pts[:, :4]), jnp.ones(len(pts), bool),
            jnp.zeros(len(pts), jnp.int32), cfg, 256)
        got = np.asarray(got_lbl)
        assert int(star_of) == 0
        agree = np.mean((got == LABEL_CURB) == (want == LABEL_CURB))
        assert agree >= 0.999, f"star marks agree {agree:.5f}"

    def test_packed_star_sort_bit_identical(self):
        """The packed 2-key star sort (ops/star._star_sort) must reproduce
        the legacy 4-operand stable (beam, radius) sort BIT-FOR-BIT on
        adversarial streams: (fk, r) ties (stability -> input order), the
        fk == 360 sink segment with +inf radii, r == 0, and radii one ulp
        apart."""
        from urban_road_filter_tpu.ops.star import _star_sort

        rng = np.random.default_rng(7)
        n = 4096
        fk = rng.integers(0, 361, n).astype(np.int32)
        r = np.abs(rng.normal(10, 5, n)).astype(np.float32)
        # ties: repeat many (fk, r) combos; ulp neighbors; zeros; inf sink
        r[::7] = r[1::7][: len(r[::7])] if False else r[::7]
        r[: n // 4] = np.repeat(r[: n // 8], 2)[: n // 4]
        fk[: n // 4] = np.repeat(fk[: n // 8], 2)[: n // 4]
        r[n // 4: n // 4 + 64] = np.nextafter(
            r[n // 4: n // 4 + 64], np.inf, dtype=np.float32)
        r[-64:] = 0.0
        sink = fk == 360
        r = np.where(sink, np.float32(np.inf), r)
        z = rng.normal(size=n).astype(np.float32)
        iota = np.arange(n, dtype=np.int32)

        want = jax.lax.sort(
            (jnp.asarray(fk), jnp.asarray(r), jnp.asarray(z),
             jnp.asarray(iota)), dimension=0, num_keys=2, is_stable=True)
        got = _star_sort(jnp.asarray(fk), jnp.asarray(r), jnp.asarray(z),
                         jnp.asarray(iota), n, packed=True)
        for g, w, name in zip(got, want, ["fk", "r", "z", "pid"]):
            g, w = np.asarray(g), np.asarray(w)
            assert g.dtype == w.dtype, name
            assert np.array_equal(g.view(np.int32), w.view(np.int32)), name

    def test_starbeam_filter_variant(self):
        cfg = FilterConfig(starbeam_filter=True)
        pts = roi_points("two_curbs", seed=3)
        want = np.zeros(len(pts), np.int16)
        oracle.star_shaped_search(pts[:, 0].astype(F32), pts[:, 1].astype(F32),
                                  pts[:, 2].astype(F32), want, cfg)
        got_lbl, _ = star_shaped(
            jnp.asarray(pts[:, :4]), jnp.ones(len(pts), bool),
            jnp.zeros(len(pts), jnp.int32), cfg, 256)
        got = np.asarray(got_lbl)
        agree = np.mean((got == LABEL_CURB) == (want == LABEL_CURB))
        assert agree >= 0.999


class TestBlindSpotGate:
    """Truth table for the quadrant gate (blind_spots.cpp:77-99),
    SURVEY.md section 4 item 2."""

    Q_FOUND = (np.float32(30.0), np.float32(120.0), np.float32(250.0),
               np.float32(300.0))  # q1..q4 all found
    Q_NONE = (np.float32(0), np.float32(180), np.float32(180), np.float32(360))

    def gate(self, i, q, xdir):
        return bool(np.asarray(_gate(jnp.asarray([np.float32(i)]), q, xdir))[0])

    def test_no_curbs_never_gates(self):
        for xdir in (0, 1, 2):
            for i in (0, 45, 90, 200, 360):
                assert not self.gate(i, self.Q_NONE, xdir)

    def test_both_directions(self):
        q = self.Q_FOUND
        # (q1!=0 && q4!=360 && (i<=q1 || i>=q4)) -> gated
        assert self.gate(20, q, 0)
        assert self.gate(310, q, 0)
        # (q2!=180 && q3!=180 && q2<=i<=q3) -> gated
        assert self.gate(200, q, 0)
        assert not self.gate(60, q, 0)
        assert not self.gate(280, q, 0)

    def test_positive_x(self):
        q = self.Q_FOUND
        # (q2!=180 && q2<=i<=270) || (q1!=0 && (i<=q1 || i>=270))
        assert self.gate(150, q, 1)
        assert self.gate(20, q, 1)
        assert self.gate(300, q, 1)  # i>=270 with q1 found
        assert not self.gate(60, q, 1)

    def test_negative_x(self):
        q = self.Q_FOUND
        # (q4!=360 && (i>=q4 || i<=90)) || (q3!=180 && 90<=i<=q3)
        assert self.gate(310, q, 2)
        assert self.gate(50, q, 2)
        assert self.gate(200, q, 2)
        assert not self.gate(280, q, 2)

    def test_partial_quadrants(self):
        # Only q1 found: xdir 0 requires q4 too -> no gate from the first
        # clause; q2/q3 pair missing -> never gated.
        q = (np.float32(30), np.float32(180), np.float32(180), np.float32(360))
        assert not self.gate(20, q, 0)
        # xdir 1: q1 alone gates i<=q1 and i>=270.
        assert self.gate(20, q, 1)
        assert self.gate(280, q, 1)
        assert not self.gate(100, q, 1)

    def test_quadrant_extremes_match_oracle(self):
        cfg = FilterConfig()
        rng = np.random.default_rng(0)
        alpha = rng.uniform(0, 360, 500).astype(np.float32)
        label = rng.choice([0, 1, 2], 500).astype(np.int32)
        order = np.argsort(alpha)
        alpha, label = alpha[order], label[order]
        want = oracle._quadrant_extremes(alpha, label.astype(np.int16))
        got = _quadrant_extremes(jnp.asarray(alpha), jnp.asarray(label),
                                 jnp.ones(500, bool))
        np.testing.assert_allclose([float(g) for g in got],
                                   [float(w) for w in want])
