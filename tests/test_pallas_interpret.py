"""Interpret-mode unit tests for the Pallas TPU kernels.

The production TPU path (ops/place.py, ops/rank.py, ops/pallas_kernels.py)
is exercised here via `interpret=True` on the CPU test backend and asserted
bit-equal to the XLA fallback implementations — including the NaN, overflow
and empty-ring edge cases (ADVICE r1: the kernels were previously covered
only by manual on-device spot checks).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow  # interpret-mode emulation dominates suite time

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.ops import geometry
from urban_road_filter_tpu.ops.place import group_place_pallas
from urban_road_filter_tpu.ops.rank import _pallas_rank, _xla_rank

F32 = np.float32
I32 = np.int32


def _scatter_reference(ids, pos, fields, num_groups, capacity):
    """The XLA unique-indices scatter placement (ops/geometry.tensorize
    non-TPU path) as a NumPy oracle."""
    outs = [np.zeros((num_groups, capacity), F32) for _ in fields]
    for i in range(len(ids)):
        g, p = int(ids[i]), int(pos[i])
        if 0 <= g < num_groups and 0 <= p < capacity:
            for f, o in zip(fields, outs):
                o[g, p] = F32(f[i])
    return outs


class TestGroupPlaceInterpret:
    def _random_case(self, rng, n, num_groups, capacity):
        ids = rng.integers(0, num_groups + 2, n).astype(I32)  # some dropped
        pos_list = np.zeros(n, I32)
        counts = {}
        for i, g in enumerate(ids):
            pos_list[i] = counts.get(int(g), 0)
            counts[int(g)] = pos_list[i] + 1
        vals = [rng.standard_normal(n).astype(F32) * 100,
                rng.standard_normal(n).astype(F32),
                rng.integers(0, 3, n).astype(F32)]
        return ids, pos_list, vals

    def test_matches_scatter(self):
        rng = np.random.default_rng(0)
        n, g, cap = 2048, 24, 1024
        ids, pos, vals = self._random_case(rng, n, g, cap)
        want = _scatter_reference(ids, pos, vals, g, cap)
        got = group_place_pallas(jnp.asarray(ids), jnp.asarray(pos),
                                 [jnp.asarray(v) for v in vals], g, cap,
                                 limb_counts=(3, 3, 1), interpret=True)
        for w, o in zip(want, got):
            np.testing.assert_array_equal(np.asarray(o), w)

    def test_nan_on_dropped_points_does_not_poison(self):
        # ADVICE r1 (high): NaN coordinates of DROPPED points (ids out of
        # range, e.g. real PCD NaN returns that fail roi_mask) must not leak
        # into any output element through the one-hot matmul.
        rng = np.random.default_rng(1)
        n, g, cap = 1024, 8, 256
        ids, pos, vals = self._random_case(rng, n, g, cap)
        dropped = ids >= g
        assert dropped.any()
        for v in vals:
            v[dropped] = np.nan
        want = _scatter_reference(ids, pos, vals, g, cap)
        got = group_place_pallas(jnp.asarray(ids), jnp.asarray(pos),
                                 [jnp.asarray(v) for v in vals], g, cap,
                                 interpret=True)
        for w, o in zip(want, got):
            o = np.asarray(o)
            assert np.isfinite(o).all()
            np.testing.assert_array_equal(o, w)

    def test_over_capacity_points_dropped(self):
        # pos >= capacity (ring overflow) must contribute nowhere, even with
        # non-finite values.
        n, g, cap = 512, 4, 128
        ids = np.zeros(n, I32)
        pos = np.arange(n, dtype=I32)  # n > cap: tail overflows
        vals = [np.arange(n, dtype=F32)]
        vals[0][cap:] = np.inf
        want = _scatter_reference(ids, pos, vals, g, cap)
        got = group_place_pallas(jnp.asarray(ids), jnp.asarray(pos),
                                 [jnp.asarray(vals[0])], g, cap,
                                 interpret=True)
        o = np.asarray(got[0])
        assert np.isfinite(o).all()
        np.testing.assert_array_equal(o, want[0])

    def test_capacity_not_panel_multiple(self):
        # Regression (code review r2): capacities in (128, 512] not divisible
        # by the 128-wide column panel were silently truncated to
        # n_cols*col_w (e.g. 192 -> 128), dropping slots >= 128 of every
        # group with overflow still 0.
        rng = np.random.default_rng(5)
        n, g, cap = 2048, 4, 192
        ids = rng.integers(0, g, n).astype(I32)
        pos = np.zeros(n, I32)
        counts = {}
        for i, gid in enumerate(ids):
            pos[i] = counts.get(int(gid), 0)
            counts[int(gid)] = pos[i] + 1
        assert max(counts.values()) > 128  # slots beyond the first panel
        vals = [rng.standard_normal(n).astype(F32)]
        want = _scatter_reference(ids, pos, vals, g, cap)
        got = group_place_pallas(jnp.asarray(ids), jnp.asarray(pos),
                                 [jnp.asarray(vals[0])], g, cap,
                                 interpret=True)
        assert got[0].shape == (g, cap)
        np.testing.assert_array_equal(np.asarray(got[0]), want[0])

    def test_full_f32_values_exact(self):
        # 3-limb decomposition must reconstruct arbitrary f32 bit patterns.
        rng = np.random.default_rng(2)
        n, g, cap = 512, 8, 128
        ids = rng.integers(0, g, n).astype(I32)
        pos = np.zeros(n, I32)
        counts = {}
        for i, gid in enumerate(ids):
            pos[i] = counts.get(int(gid), 0)
            counts[int(gid)] = pos[i] + 1
        v = (rng.standard_normal(n) * np.exp(rng.uniform(-20, 20, n))).astype(F32)
        want = _scatter_reference(ids, pos, [v], g, cap)
        got = group_place_pallas(jnp.asarray(ids), jnp.asarray(pos),
                                 [jnp.asarray(v)], g, cap, interpret=True)
        np.testing.assert_array_equal(np.asarray(got[0]), want[0])

    def test_byte_limbs_bit_exact(self):
        # s8 byte-limb kernel: exact for every f32 bit pattern, including
        # negatives (sign byte >= 128), huge/tiny exponents, dropped-point
        # NaNs and over-capacity Infs.
        rng = np.random.default_rng(9)
        n, g, cap = 4096, 32, 256  # g multiple of 32 (i8 sublane tiling)
        ids = rng.integers(0, g + 2, n).astype(I32)
        pos = np.zeros(n, I32)
        counts = {}
        for i, gid in enumerate(ids):
            pos[i] = counts.get(int(gid), 0)
            counts[int(gid)] = pos[i] + 1
        vals = [(rng.standard_normal(n)
                 * np.exp(rng.uniform(-20, 20, n))).astype(F32),
                rng.standard_normal(n).astype(F32) * 100,
                rng.integers(0, 3, n).astype(F32)]
        dropped = ids >= g
        assert dropped.any()
        for v in vals:
            v[dropped] = np.nan
        over = pos >= cap
        for v in vals:
            v[over & ~dropped] = np.inf
        want = _scatter_reference(ids, pos, vals, g, cap)
        got = group_place_pallas(jnp.asarray(ids), jnp.asarray(pos),
                                 [jnp.asarray(v) for v in vals], g, cap,
                                 interpret=True, byte_limbs=True)
        for w, o in zip(want, got):
            o = np.asarray(o)
            assert np.isfinite(o).all()
            np.testing.assert_array_equal(o, w)

        # counts-derived occupancy (round 5: drops the occ row from the
        # dot) is bit-equal on the same adversarial case.
        counts_arr = np.asarray(
            [min(counts.get(r, 0), cap) for r in range(g)], I32)
        got_c = group_place_pallas(jnp.asarray(ids), jnp.asarray(pos),
                                   [jnp.asarray(v) for v in vals], g, cap,
                                   interpret=True, byte_limbs=True,
                                   counts=jnp.asarray(counts_arr))
        for w, o in zip(want, got_c):
            o = np.asarray(o)
            assert np.isfinite(o).all()
            np.testing.assert_array_equal(o, w)


class TestGatherInterpret:
    @pytest.mark.parametrize("pack", [1, 4])
    def test_matches_fancy_index(self, pack):
        from urban_road_filter_tpu.ops.gather import gather_by_group_pos

        rng = np.random.default_rng(7)
        g, cap, n = 64, 256, 3000
        table = rng.integers(0, 3, (g, cap)).astype(F32)
        ids = rng.integers(0, g + 2, n).astype(I32)  # some out of range
        pos = rng.integers(0, cap, n).astype(I32)
        pos[::37] = cap  # the over-capacity sentinel value
        want = np.where((ids < g) & (pos < cap),
                        table[np.clip(ids, 0, g - 1),
                              np.clip(pos, 0, cap - 1)], 0)
        got = gather_by_group_pos(jnp.asarray(table), jnp.asarray(ids),
                                  jnp.asarray(pos), interpret=True, pack=pack)
        np.testing.assert_array_equal(np.asarray(got), want)

    @pytest.mark.parametrize("g_mult", [8, 128])
    @pytest.mark.parametrize("g_extra", [0, 2])
    def test_i8_matches_fancy_index(self, g_mult, g_extra):
        # s8-MXU gather (round 5): word-128 table with the per-point +128
        # correction must match for in-table, zero-column (g_pad >
        # num_groups), dropped-id and over-capacity points, at both the
        # full-lane and minimal-sublane group pads.
        from urban_road_filter_tpu.ops.gather import gather_by_group_pos

        rng = np.random.default_rng(11)
        g, cap, n = 64 - g_extra, 256, 3000
        table = rng.integers(0, 3, (g, cap)).astype(F32)
        ids = rng.integers(0, g + 2, n).astype(I32)
        pos = rng.integers(0, cap, n).astype(I32)
        pos[::37] = cap
        want = np.where((ids < g) & (pos < cap),
                        table[np.clip(ids, 0, g - 1),
                              np.clip(pos, 0, cap - 1)], 0)
        got = gather_by_group_pos(jnp.asarray(table), jnp.asarray(ids),
                                  jnp.asarray(pos), interpret=True, pack=4,
                                  i8=True, g_mult=g_mult)
        np.testing.assert_array_equal(np.asarray(got), want)


class TestStarScanInterpret:
    # blind_spot @ 48x1024 spans 3 kernel blocks: the in-kernel slope /
    # reset-flag derivation must carry fk/r/z across block boundaries.
    @pytest.mark.parametrize("scene,seed,rings_az", [
        ("two_curbs", 0, (24, 512)), ("blind_spot", 3, (24, 512)),
        ("blind_spot", 5, (48, 1024))])
    def test_matches_xla_scan_path(self, scene, seed, rings_az):
        """The Pallas star-walk kernel must produce the same per-beam hits
        as the associative_scan fallback on real scene data."""
        import math

        import jax.numpy as jnp

        from urban_road_filter_tpu.constants import STAR_KFI, STAR_REP
        from urban_road_filter_tpu.ops.star import star_hits
        from urban_road_filter_tpu.ops.star_scan import star_scan_pallas
        from urban_road_filter_tpu.oracle import reference as oracle

        cfg = FilterConfig()
        pts = make_scan(SCENES[scene](), n_rings=rings_az[0],
                        n_azimuth=rings_az[1], seed=seed)
        pts = pts[oracle.roi_mask(pts, cfg)].astype(np.float32)
        n = len(pts)
        valid = jnp.ones(n, bool)
        want_hp, _ = star_hits(jnp.asarray(pts[:, :4]), valid, cfg)  # XLA path

        # Re-derive the sorted stream exactly as star_hits does.
        x, y, z = (jnp.asarray(pts[:, k]) for k in range(3))
        r = jnp.sqrt(x * x + y * y)
        fi = jnp.arctan2(y, x)
        fi = jnp.where(fi < 0, fi + np.float32(2 * math.pi), fi)
        f = (fi * np.float32(STAR_KFI)).astype(jnp.int32) % STAR_REP
        iota = jnp.arange(n, dtype=jnp.int32)
        fk_s, r_s, z_s, pid_s = jax.lax.sort(
            (f, r, z, iota), dimension=0, num_keys=2, is_stable=True)
        slope_param = float(np.float32(cfg.curb_slope_deg)) * math.pi / 180.0
        got_hp = star_scan_pallas(
            fk_s, r_s, z_s, pid_s,
            slope_param=float(np.float32(slope_param)),
            kdev=float(cfg.kdev_param), kdist=float(cfg.kdist_param),
            dmin=int(cfg.dmin_param), num_beams=STAR_REP, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_hp), np.asarray(want_hp))
        assert int((np.asarray(want_hp) > 0).sum()) > 0  # scene has hits

    def test_adversarial_stream(self):
        """Constructed sorted stream: duplicate radii (NaN/Inf slopes),
        single-point beams, empty beams, an inf-radius sink segment, and a
        stream length straddling a block boundary — kernel must equal the
        associative_scan recurrence chain bit-for-bit."""
        import math

        import jax.numpy as jnp

        from urban_road_filter_tpu.constants import STAR_REP
        from urban_road_filter_tpu.ops.star import _segmented_cumsums
        from urban_road_filter_tpu.ops.star_scan import star_scan_pallas

        rng = np.random.default_rng(11)
        n = 8200  # one full 8192 block + a 8-element tail block
        # ~500 used beams; beams 100-110 empty; beam 7 single-point.
        beams = np.sort(rng.integers(0, 360, n)).astype(np.int32)
        beams = beams[(beams < 100) | (beams > 110) | (beams == 0)]
        beams = np.concatenate([beams, np.full(n - len(beams), 359,
                                               np.int32)])
        beams = np.sort(beams)
        r = rng.uniform(0.5, 30.0, n).astype(np.float32)
        # duplicate radii inside beams: NaN (dz==0) and Inf (dz!=0) slopes
        dup = rng.random(n) < 0.15
        r[1:][dup[1:] & (beams[1:] == beams[:-1])] = 0  # marker, fixed below
        z = rng.uniform(-2, 2, n).astype(np.float32)
        # sort within beams by r (global sort with iota tiebreak)
        order = np.lexsort((np.arange(n), r, beams))
        fk_s = beams[order]
        r_s = np.sort(r)[::-1].copy()  # placeholder; rebuild properly:
        r_s = r[order].copy()
        z_s = z[order].copy()
        # inject exact duplicates AFTER sorting (keeps sortedness)
        dup_pos = np.nonzero((fk_s[1:] == fk_s[:-1])
                             & (rng.random(n - 1) < 0.2))[0] + 1
        r_s[dup_pos] = r_s[dup_pos - 1]  # dr == 0
        z_s[dup_pos[::2]] = z_s[dup_pos[::2] - 1]  # half also dz == 0 (NaN)
        # sink segment: trailing dropped points at fk == STAR_REP, r == inf
        fk_s[-40:] = STAR_REP
        r_s[-40:] = np.inf
        pid_s = rng.permutation(n).astype(np.int32)

        fk_j = jnp.asarray(fk_s)
        r_j = jnp.asarray(r_s)
        z_j = jnp.asarray(z_s)
        pid_j = jnp.asarray(pid_s)
        slope_param = float(np.float32(0.3))
        kdev, kdist, dmin = 1.1, 2.0, 3

        # XLA recurrence chain (the star.py fallback, verbatim semantics).
        firstv = jnp.concatenate([jnp.ones((1,), bool),
                                  fk_j[1:] != fk_j[:-1]])
        wk = (fk_j < STAR_REP) & ~firstv
        dr = r_j - jnp.roll(r_j, 1)
        slp = (z_j - jnp.roll(z_j, 1)) / dr
        vstat = wk & ~jnp.isnan(slp)
        rank, m, sum_slp = _segmented_cumsums(firstv, (
            jnp.ones((n,), I32), vstat.astype(F32),
            jnp.where(vstat, slp, F32(0))))
        avg = jnp.where(m > 0, sum_slp / m, F32(0))
        (sum_dev,) = _segmented_cumsums(
            firstv, (jnp.where(vstat, jnp.abs(slp - avg), F32(0)),))
        dev = jnp.where(m > 0, sum_dev / m, F32(0))
        adaptive = (rank - 1 > dmin) & (
            (slp * slp - avg * avg) * F32(kdev) * (dr * F32(kdist)) > dev)
        trigger = wk & ((slp > F32(slope_param)) | adaptive)
        (trig_rank,) = _segmented_cumsums(firstv, (trigger.astype(I32),))
        first_trig = trigger & (trig_rank == 1)
        bins = jnp.arange(STAR_REP, dtype=I32)
        want_hp = jnp.sum(jnp.where((fk_j[:, None] == bins[None, :])
                                    & first_trig[:, None],
                                    (pid_j + 1)[:, None], 0), axis=0)

        got_hp = star_scan_pallas(
            fk_j, r_j, z_j, pid_j, slope_param=slope_param, kdev=kdev,
            kdist=kdist, dmin=dmin, num_beams=STAR_REP, interpret=True)
        np.testing.assert_array_equal(np.asarray(got_hp),
                                      np.asarray(want_hp))
        assert int((np.asarray(want_hp) > 0).sum()) > 5

        # blocks-per-step folds are bit-exact on the same adversarial
        # stream (the fold only regroups grid steps; carries flow through
        # registers instead of scratch — round 5).
        for bps in (2, 4):
            got_bps = star_scan_pallas(
                fk_j, r_j, z_j, pid_j, slope_param=slope_param, kdev=kdev,
                kdist=kdist, dmin=dmin, num_beams=STAR_REP, interpret=True,
                bps=bps)
            np.testing.assert_array_equal(np.asarray(got_bps),
                                          np.asarray(want_hp))


class TestRankInterpret:
    @pytest.mark.parametrize("n,groups,seed", [(300, 5, 0), (4096, 65, 1),
                                               (5000, 361, 2)])
    def test_matches_xla(self, n, groups, seed):
        rng = np.random.default_rng(seed)
        ids = jnp.asarray(rng.integers(0, groups, n).astype(I32))
        pos_p, cnt_p = _pallas_rank(ids, groups, interpret=True)
        pos_x, cnt_x = _xla_rank(ids, groups)
        np.testing.assert_array_equal(np.asarray(pos_p), np.asarray(pos_x))
        np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_x))

    def test_single_group(self):
        ids = jnp.zeros(1000, jnp.int32)
        pos, cnt = _pallas_rank(ids, 4, interpret=True)
        np.testing.assert_array_equal(np.asarray(pos), np.arange(1000))
        np.testing.assert_array_equal(np.asarray(cnt), [1000, 0, 0, 0])


class TestFusedXZZeroInterpret:
    def _layout(self, scene="two_curbs", seed=0):
        cfg = FilterConfig()
        pts = make_scan(SCENES[scene](), n_rings=16, n_azimuth=256, seed=seed)
        pts = jnp.asarray(pts[:4096, :4].astype(F32))
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        valid = geometry.roi_mask(pts, cfg)
        _, av = geometry.vertical_angles(x, y, z)
        angles, _ = geometry.discover_rings(av, valid, cfg.interval)
        ring_id = geometry.assign_rings(av, valid, angles, cfg.interval)
        layout, _ = geometry.tensorize(x, y, z, ring_id, 256)
        return layout, cfg

    def test_matches_xla_stencils(self):
        from urban_road_filter_tpu.ops.pallas_kernels import fused_xz_zero
        from urban_road_filter_tpu.ops.xzero import x_zero
        from urban_road_filter_tpu.ops.zzero import z_zero

        layout, cfg = self._layout()
        want = np.asarray(z_zero(x_zero(layout, cfg), cfg).label)
        got = np.asarray(fused_xz_zero(layout, cfg, interpret=True).label)
        assert want.max() > 0  # the scene must actually trigger marks
        np.testing.assert_array_equal(got, want)

    def test_empty_and_short_rings(self):
        # Rings with 0 or < 2*curb_points+1 points must produce no marks and
        # no NaN contamination of neighbouring rows.
        from urban_road_filter_tpu.ops.pallas_kernels import fused_xz_zero
        from urban_road_filter_tpu.ops.xzero import x_zero
        from urban_road_filter_tpu.ops.zzero import z_zero

        cfg = FilterConfig()
        rng = np.random.default_rng(3)
        n = 512
        # Ring 0: many points; ring 1: 3 points (short); ring 2+: empty.
        ring_id = np.zeros(n, I32)
        ring_id[200:203] = 1
        x = rng.standard_normal(n).astype(F32)
        y = rng.standard_normal(n).astype(F32)
        z = (rng.standard_normal(n) * 0.3).astype(F32)
        layout, _ = geometry.tensorize(
            jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
            jnp.asarray(ring_id), 512)
        want = np.asarray(z_zero(x_zero(layout, cfg), cfg).label)
        got = np.asarray(fused_xz_zero(layout, cfg, interpret=True).label)
        np.testing.assert_array_equal(got, want)
        assert got[1].max() == 0 and got[2:].max() == 0


class TestMarkerScanInterpret:
    @pytest.mark.parametrize("scene,seed", [("two_curbs", 0), ("blind_spot", 4),
                                            ("curb_gap", 7)])
    def test_matches_xla_markers(self, scene, seed):
        from urban_road_filter_tpu.config import FilterConfig
        from urban_road_filter_tpu.ops.blind_spots import blind_spots
        from urban_road_filter_tpu.ops.marker_scan import marker_points_pallas
        from urban_road_filter_tpu.ops.markers import marker_points
        from urban_road_filter_tpu.ops.star import star_shaped

        cfg = FilterConfig()
        pts = make_scan(SCENES[scene](), n_rings=16, n_azimuth=512, seed=seed)
        pts = jnp.asarray(pts[:8192, :4].astype(F32))
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        valid = geometry.roi_mask(pts, cfg)
        labels0, _ = star_shaped(pts, valid, jnp.zeros(len(pts), jnp.int32),
                                 cfg, 0)
        _, av = geometry.vertical_angles(x, y, z)
        angles, nr = geometry.discover_rings(av, valid, cfg.interval)
        ring_id = geometry.assign_rings(av, valid, angles, cfg.interval)
        layout, _ = geometry.tensorize(x, y, z, ring_id, 512, label=labels0)
        layout = blind_spots(layout, geometry.max_distance(layout), nr, cfg)
        sl = geometry.sort_by_azimuth(layout)

        want = np.asarray(marker_points(sl, nr))
        got = np.asarray(marker_points_pallas(sl, nr, interpret=True))
        assert want[:, 0].sum() > 10  # scene produces real markers
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("scene,seed", [("two_curbs", 0), ("blind_spot", 4),
                                            ("curb_gap", 7)])
    def test_unsorted_path_matches_sorted(self, scene, seed):
        """The sort-free marker path (round 3): lexicographic
        (ring, alpha, slot) keys over the UNSORTED layout must equal the
        sorted-layout reference bit-for-bit (stable sort == key order)."""
        from urban_road_filter_tpu.config import FilterConfig
        from urban_road_filter_tpu.ops.blind_spots import blind_spots
        from urban_road_filter_tpu.ops.marker_scan import (
            marker_points_unsorted_pallas)
        from urban_road_filter_tpu.ops.markers import marker_points
        from urban_road_filter_tpu.ops.star import star_shaped

        cfg = FilterConfig()
        pts = make_scan(SCENES[scene](), n_rings=16, n_azimuth=512, seed=seed)
        pts = jnp.asarray(pts[:8192, :4].astype(F32))
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        valid = geometry.roi_mask(pts, cfg)
        labels0, _ = star_shaped(pts, valid, jnp.zeros(len(pts), jnp.int32),
                                 cfg, 0)
        _, av = geometry.vertical_angles(x, y, z)
        angles, nr = geometry.discover_rings(av, valid, cfg.interval)
        ring_id = geometry.assign_rings(av, valid, angles, cfg.interval)
        layout, _ = geometry.tensorize(x, y, z, ring_id, 512, label=labels0)
        layout = blind_spots(layout, geometry.max_distance(layout), nr, cfg)

        want = np.asarray(marker_points(geometry.sort_by_azimuth(layout), nr))
        got = np.asarray(marker_points_unsorted_pallas(layout, nr,
                                                       interpret=True))
        assert want[:, 0].sum() > 10
        np.testing.assert_array_equal(got, want)

    def test_unsorted_path_duplicate_distance_tie(self):
        """Two road points in one bin/ring at the SAME distance: the winner
        must be the earlier one in (alpha, slot) order (the reference's
        strict-> update keeps the first traversal hit)."""
        from urban_road_filter_tpu.ops.geometry import RingLayout
        from urban_road_filter_tpu.ops.marker_scan import (
            marker_points_unsorted_pallas)
        from urban_road_filter_tpu.ops.markers import marker_points

        r, p = 8, 128
        x = np.zeros((r, p), np.float32)
        y = np.zeros((r, p), np.float32)
        z = np.zeros((r, p), np.float32)
        lbl = np.zeros((r, p), np.int32)
        # Ring 0: slots 0..3 in bin 10; slots 1 and 3 both at radius 5
        # (identical d), slot 1 has LARGER alpha than slot 3 -> winner is
        # slot 3 (smaller alpha; traversal is azimuth order, not slot).
        for s, (deg, rad) in enumerate([(10.2, 3.0), (10.8, 5.0),
                                        (10.4, 4.0), (10.5, 5.0)]):
            x[0, s] = rad * np.cos(np.radians(90 - deg))
            y[0, s] = -rad * np.sin(np.radians(90 - deg))
            lbl[0, s] = 1
        counts = np.zeros((r,), np.int32)
        counts[0] = 4
        from urban_road_filter_tpu.ops.geometry import azimuth_2d

        d2, alpha = azimuth_2d(jnp.asarray(x), jnp.asarray(y))
        lay = RingLayout(x=jnp.asarray(x), y=jnp.asarray(y), z=jnp.asarray(z),
                         d2=d2, alpha=alpha, label=jnp.asarray(lbl),
                         pid=jnp.full((r, p), -1, jnp.int32),
                         counts=jnp.asarray(counts),
                         overflow=jnp.asarray(0, jnp.int32))
        want = np.asarray(marker_points(geometry.sort_by_azimuth(lay),
                                        jnp.asarray(1)))
        got = np.asarray(marker_points_unsorted_pallas(lay, jnp.asarray(1),
                                                       interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_unsorted_path_empty(self):
        from urban_road_filter_tpu.ops.geometry import RingLayout
        from urban_road_filter_tpu.ops.marker_scan import (
            marker_points_unsorted_pallas)
        from urban_road_filter_tpu.ops.markers import marker_points

        r, p = 8, 512
        zero = jnp.zeros((r, p), jnp.float32)
        lay = RingLayout(x=zero, y=zero, z=zero, d2=zero,
                         alpha=jnp.full((r, p), jnp.nan),
                         label=jnp.zeros((r, p), jnp.int32),
                         pid=jnp.full((r, p), -1, jnp.int32),
                         counts=jnp.zeros((r,), jnp.int32),
                         overflow=jnp.asarray(0, jnp.int32))
        want = np.asarray(marker_points(lay, jnp.asarray(0)))
        got = np.asarray(marker_points_unsorted_pallas(lay, jnp.asarray(0),
                                                       interpret=True))
        np.testing.assert_array_equal(got, want)

    def test_empty_scan(self):
        from urban_road_filter_tpu.ops.marker_scan import marker_points_pallas
        from urban_road_filter_tpu.ops.markers import marker_points
        from urban_road_filter_tpu.ops.geometry import RingLayout

        r, p = 8, 512
        zero = jnp.zeros((r, p), jnp.float32)
        lay = RingLayout(x=zero, y=zero, z=zero, d2=zero,
                         alpha=jnp.full((r, p), jnp.nan),
                         label=jnp.zeros((r, p), jnp.int32),
                         pid=jnp.full((r, p), -1, jnp.int32),
                         counts=jnp.zeros((r,), jnp.int32),
                         overflow=jnp.asarray(0, jnp.int32))
        want = np.asarray(marker_points(lay, jnp.asarray(0)))
        got = np.asarray(marker_points_pallas(lay, jnp.asarray(0),
                                              interpret=True))
        np.testing.assert_array_equal(got, want)


class TestFloodScanInterpret:
    """ops/flood_scan.py vs the XLA blocked_bits/labeled_mask cubes."""

    def _layout(self, scene, seed, beam_zone, n_rings=16, cap=512):
        from urban_road_filter_tpu.ops.star import star_shaped

        cfg = FilterConfig(beam_zone=beam_zone)
        pts = make_scan(SCENES[scene](), n_rings=n_rings, n_azimuth=cap,
                        seed=seed)
        pts = jnp.asarray(pts[:n_rings * cap, :4].astype(F32))
        x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]
        valid = geometry.roi_mask(pts, cfg)
        labels0, _ = star_shaped(pts, valid, jnp.zeros(len(pts), jnp.int32),
                                 cfg, 0)
        _, av = geometry.vertical_angles(x, y, z)
        angles, nr = geometry.discover_rings(av, valid, cfg.interval)
        ring_id = geometry.assign_rings(av, valid, angles, cfg.interval)
        layout, _ = geometry.tensorize(x, y, z, ring_id, cap, label=labels0)
        return layout, nr, cfg

    def _check(self, layout, nr, cfg):
        from urban_road_filter_tpu.ops.blind_spots import (
            blocked_bits, labeled_mask, sweep_bounds, window_widths)
        from urban_road_filter_tpu.ops.flood_scan import (
            blocked_pallas, labeled_pallas)
        from urban_road_filter_tpu.constants import LABEL_CURB

        alpha, label, counts = layout.alpha, layout.label, layout.counts
        p = alpha.shape[1]
        slot_valid = jnp.arange(p)[None, :] < counts[:, None]
        ring_active = (jnp.arange(alpha.shape[0]) < nr)[:, None]
        curb = slot_valid & (label == LABEL_CURB)
        a_ok = (slot_valid & jnp.isfinite(alpha) & (alpha >= 0)
                & (alpha <= np.float32(360)))
        w = window_widths(geometry.max_distance(layout), cfg.beam_zone)

        got_bf, got_bb = blocked_pallas(layout, w, cfg.beam_zone,
                                        interpret=True)
        reaches = {}
        for direction, got_b in ((+1, got_bf), (-1, got_bb)):
            active, lo, hi = sweep_bounds(w, cfg.beam_zone, direction)
            want_b = np.asarray(blocked_bits(alpha, curb, lo, hi))
            np.testing.assert_array_equal(np.asarray(got_b), want_b)
            not_blocked = (~(jnp.asarray(want_b) & ring_active)).astype(I32)
            reach = ((jnp.cumprod(not_blocked, axis=0) > 0)
                     & active[None, :] & ring_active)
            reaches[direction] = reach
            # each sweep's labeled mask separately (zero the other reach)
            got_l1 = labeled_pallas(layout, reach if direction > 0 else
                                    jnp.zeros_like(reach),
                                    reach if direction < 0 else
                                    jnp.zeros_like(reach),
                                    w, cfg.beam_zone, interpret=True)
            want_l1 = np.asarray(labeled_mask(alpha, a_ok, reach, lo, hi))
            np.testing.assert_array_equal(np.asarray(got_l1), want_l1)
        return reaches

    @pytest.mark.parametrize("scene,seed,bz", [
        ("two_curbs", 0, 30.0),
        ("blind_spot", 4, 100.0),
        ("two_curbs", 1, 45.5),   # non-integral: no exact-equality special
        ("curb_gap", 7, 10.0),
    ])
    def test_matches_xla_cubes(self, scene, seed, bz):
        layout, nr, cfg = self._layout(scene, seed, bz)
        reaches = self._check(layout, nr, cfg)
        # The scene must actually exercise both sweeps.
        assert bool(jnp.any(reaches[+1])) and bool(jnp.any(reaches[-1]))

    @pytest.mark.parametrize("scene,seed", [("two_curbs", 0),
                                            ("blind_spot", 4)])
    def test_fused_labeled_markerf(self, scene, seed):
        """labeled_markerf_pallas == labeled_pallas road mask AND the
        separate marker pass-1 state on the POST-flood labels (round 3:
        marker pass 1 rides inside the flood's labeled kernel)."""
        from urban_road_filter_tpu.constants import LABEL_CURB, LABEL_ROAD
        from urban_road_filter_tpu.ops.blind_spots import (
            sweep_bounds, window_widths)
        from urban_road_filter_tpu.ops.flood_scan import (
            blocked_pallas, labeled_markerf_pallas, labeled_pallas)
        from urban_road_filter_tpu.ops.marker_scan import (
            _BPAD, _marker_f_kernel)
        import functools

        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        layout, nr, cfg = self._layout(scene, seed, 30.0)
        w = window_widths(geometry.max_distance(layout), cfg.beam_zone)
        rings = layout.alpha.shape[0]
        ring_iota = jnp.arange(rings, dtype=jnp.int32)
        ring_active = (ring_iota < nr)[:, None]

        bf, bb = blocked_pallas(layout, w, cfg.beam_zone, interpret=True)

        def reach_of(blocked, direction):
            active, _, _ = sweep_bounds(w, cfg.beam_zone, direction)
            first = jnp.min(jnp.where(blocked & ring_active,
                                      ring_iota[:, None], rings), axis=0)
            return ((ring_iota[:, None] < first[None, :])
                    & active[None, :] & ring_active)

        rf, rb = reach_of(bf, +1), reach_of(bb, -1)
        want_road = labeled_pallas(layout, rf, rb, w, cfg.beam_zone,
                                   interpret=True)
        got_road, got_kf = labeled_markerf_pallas(layout, rf, rb, w,
                                                  cfg.beam_zone,
                                                  interpret=True)
        np.testing.assert_array_equal(np.asarray(got_road),
                                      np.asarray(want_road))

        # Reference kf: the standalone pass-1 kernel on post-flood labels.
        post = jnp.where(jnp.asarray(want_road)
                         & (layout.label != LABEL_CURB),
                         LABEL_ROAD, layout.label)
        lay2 = layout._replace(label=post)
        r, p = lay2.alpha.shape
        counts = lay2.counts.astype(jnp.int32).reshape(1, r)
        nring = jnp.full((1, 1), nr, jnp.int32)
        blk3 = lambda a: a.reshape(r, 1, p)
        want_kf = pl.pallas_call(
            functools.partial(_marker_f_kernel, blocks_per_ring=1, blk_w=p,
                              rows_per_step=1),
            grid=(r,),
            in_specs=[pl.BlockSpec((1, r), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0)),
                      pl.BlockSpec((1, 1, p), lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((_BPAD, 8), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((_BPAD, 8), jnp.float32),
            scratch_shapes=[pltpu.VMEM((_BPAD, 8), jnp.float32)],
            interpret=True,
        )(counts, nring, blk3(lay2.alpha),
          blk3(lay2.label.astype(jnp.float32)))
        np.testing.assert_array_equal(np.asarray(got_kf)[:, :3],
                                      np.asarray(want_kf)[:, :3])

    def test_nan_azimuth_and_empty_rings(self):
        # x = y = 0 points (NaN azimuth) must neither block nor be labeled;
        # empty rings (w = inf) must not derail the prechecks.
        layout, nr, cfg = self._layout("two_curbs", 2, 10.0)
        lab = np.asarray(layout.label)
        alpha = np.asarray(layout.alpha).copy()
        x = np.asarray(layout.x).copy()
        y = np.asarray(layout.y).copy()
        # Inject NaN-azimuth curb points inside the valid range of ring 1.
        c1 = int(layout.counts[1])
        assert c1 > 4
        x[1, : 3] = 0.0
        y[1, : 3] = 0.0
        alpha[1, : 3] = np.nan
        lab = lab.copy()
        lab[1, : 3] = 2
        layout = layout._replace(x=jnp.asarray(x), y=jnp.asarray(y),
                                 alpha=jnp.asarray(alpha),
                                 label=jnp.asarray(lab))
        self._check(layout, nr, cfg)


class TestIngestKernelsInterpret:
    """ops/ingest_scan.py vs the XLA ingest formulations (VERDICT r3
    item 6): bit-equal ROI mask / star sort keys / in-ROI count, and
    bit-equal ring assignment on the NaN-masked vertical angle."""

    def _scan(self, scene="two_curbs", seed=3, n=8192):
        from urban_road_filter_tpu.pipeline import pad_scan

        pts = pad_scan(make_scan(SCENES[scene](), n_rings=24, n_azimuth=384,
                                 seed=seed), n)
        # Adversarial rows: exact ROI boundary hits, the x+y+z == 0 drop,
        # a near-2pi azimuth whose f32 sector index rounds to exactly
        # STAR_REP (the %-wrap case), and axis-aligned points.
        cfg = FilterConfig()
        pts[0] = (cfg.max_x, 0.5, -0.5, 0)      # on the max_x bound: kept
        pts[1] = (cfg.min_x, -0.5, 0.5, 0)      # on the min_x bound: kept
        pts[2] = (1.0, 2.0, -3.0, 0)            # x+y+z == 0: dropped
        pts[3] = (40.0, -1e-6, 0.2, 0)          # fi wraps to ~2pi: f -> 360?
        pts[4] = (5.0, 0.0, 0.1, 0)             # fi == 0 exactly
        pts[5] = (0.0, 5.0, 0.1, 0)             # fi == pi/2
        pts[6] = (0.0, 0.0, 4.0, 0)             # x=y=0: NaN 2-D azimuth path
        return pts, cfg

    @pytest.mark.parametrize("batch", [1, 4])
    def test_ingest_prep_matches_xla(self, batch):
        import math

        from urban_road_filter_tpu.constants import STAR_KFI, STAR_REP
        from urban_road_filter_tpu.ops.ingest_scan import ingest_prep_pallas

        pts, cfg = self._scan()
        ptsb = np.stack([pts] * batch)
        if batch > 1:
            ptsb[-1, 7:100] = 0  # vary the last scan's in-ROI count
        x, y, z = (jnp.asarray(ptsb[..., i]) for i in range(3))
        fi_raw = jnp.arctan2(y, x)

        got_valid, got_fk, got_rk, got_piece = ingest_prep_pallas(
            x, y, z, fi_raw, cfg, interpret=True)
        got_valid, got_fk, got_rk = got_valid[0], got_fk[0], got_rk[0]

        want_valid = geometry.roi_mask(jnp.asarray(pts), cfg)

        # The ops/star.py pre-sort key math, verbatim (star.py:119-144).
        # JITTED like the production pipeline: eager XLA CPU skips the FMA
        # in x*x + y*y that both the jitted graph and the interpreted
        # kernel emit, a 1-ulp cross-graph artifact of the CPU backend
        # only (CLAUDE.md; on the real TPU Mosaic and XLA are bit-equal
        # for this expression, tools/probe_ingest_math.py sqrt_mod).
        @jax.jit
        def want_keys(x, y, fi_raw, want_valid):
            r = jnp.sqrt(x * x + y * y)
            fi = jnp.where(fi_raw < 0, fi_raw + F32(2.0 * math.pi), fi_raw)
            f = (fi * F32(STAR_KFI)).astype(jnp.int32) % np.int32(STAR_REP)
            return (jnp.where(want_valid, f, STAR_REP),
                    jnp.where(want_valid, r, jnp.inf))

        want_fk, want_rk = want_keys(x[0], y[0], fi_raw[0], want_valid)

        np.testing.assert_array_equal(np.asarray(got_valid),
                                      np.asarray(want_valid))
        np.testing.assert_array_equal(np.asarray(got_fk), np.asarray(want_fk))
        np.testing.assert_array_equal(np.asarray(got_rk), np.asarray(want_rk))
        assert int(got_piece[0]) == int(np.asarray(want_valid).sum())
        # Per-scan counts stay per-sublane: the modified last scan differs.
        want_last = geometry.roi_mask(jnp.asarray(ptsb[-1]), cfg)
        assert int(got_piece[-1]) == int(np.asarray(want_last).sum())

    def test_ingest_prep_no_star_keys(self):
        # Non-star configs skip the fk/rk outputs entirely (ADVICE r4);
        # valid/piece must stay bit-equal to the star variant's.
        from urban_road_filter_tpu.ops.ingest_scan import ingest_prep_pallas

        pts, cfg = self._scan()
        ptsb = np.stack([pts] * 4)
        ptsb[-1, 7:100] = 0
        x, y, z = (jnp.asarray(ptsb[..., i]) for i in range(3))
        fi_raw = jnp.arctan2(y, x)
        v1, fk, rk, p1 = ingest_prep_pallas(x, y, z, fi_raw, cfg,
                                            interpret=True)
        v2, fk2, rk2, p2 = ingest_prep_pallas(x, y, z, None, cfg,
                                              interpret=True,
                                              want_star_keys=False)
        assert fk2 is None and rk2 is None and fk is not None
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    def test_grid_dims_lane_aligned(self):
        # The cols fallback must stay a multiple of 128 lanes, and a
        # non-multiple point count must fail on the HOST (a lane-unaligned
        # Mosaic block poisons the axon server — ADVICE r4 / CLAUDE.md).
        from urban_road_filter_tpu.ops.ingest_scan import _grid_dims

        for n, cols in ((131072, 8192), (131072, 100000), (96 * 128, 8192),
                        (131072, 131072), (640, 100), (127 * 128, 8192)):
            bb, c, n_b, n_n = _grid_dims(8, n, cols)
            assert c % 128 == 0 and n % c == 0 and n_n == n // c, (n, cols, c)
        with pytest.raises(ValueError, match="multiple of 128"):
            _grid_dims(8, 1000, 512)

    @pytest.mark.parametrize("rings", [24, 64])
    def test_assign_rings_matches_xla(self, rings):
        # Batch of 3 scans with DIFFERENT ring tables (different seeds):
        # each sublane must bin against its own table.
        from urban_road_filter_tpu.ops.ingest_scan import assign_rings_pallas

        alphas, tables, wants = [], [], []
        for seed in (rings, rings + 1, rings + 2):
            pts, cfg = self._scan(seed=seed)
            x, y, z = (jnp.asarray(pts[:, i]) for i in range(3))
            valid = geometry.roi_mask(jnp.asarray(pts), cfg)
            _, alpha_v = geometry.vertical_angles(x, y, z)
            angles, _ = geometry.discover_rings(alpha_v, valid, cfg.interval,
                                                rings=rings)
            wants.append(geometry.assign_rings(alpha_v, valid, angles,
                                               cfg.interval))
            alphas.append(jnp.where(valid, alpha_v, jnp.nan))
            tables.append(angles)

        got = assign_rings_pallas(jnp.stack(alphas), jnp.stack(tables),
                                  cfg.interval, interpret=True)
        np.testing.assert_array_equal(np.asarray(got),
                                      np.stack([np.asarray(w) for w in wants]))

    def test_assign_rings_empty_table(self):
        # No rings discovered (all-invalid scan): every point -> `rings`.
        from urban_road_filter_tpu.ops.ingest_scan import assign_rings_pallas

        alpha_m = jnp.full((1, 512), jnp.nan, jnp.float32)
        angles = jnp.full((1, 24), jnp.inf, jnp.float32)
        got = assign_rings_pallas(alpha_m, angles, 0.18, interpret=True)
        np.testing.assert_array_equal(np.asarray(got), np.full((1, 512), 24))

    @pytest.mark.parametrize("rings", [24, 64])
    def test_discover_rings_matches_xla(self, rings):
        # Batch of 3 scans (different seeds): the greedy must run per
        # sublane, bit-equal to geometry.discover_rings on (alpha, valid).
        from urban_road_filter_tpu.ops.ingest_scan import discover_rings_pallas

        alphas, want_angles, want_counts = [], [], []
        for seed in (rings, rings + 5, rings + 6):
            pts, cfg = self._scan(seed=seed)
            if seed == rings + 6:
                pts[:] = 0  # all-invalid scan: zero rings, all-inf table
            x, y, z = (jnp.asarray(pts[:, i]) for i in range(3))
            valid = geometry.roi_mask(jnp.asarray(pts), cfg)
            _, alpha_v = geometry.vertical_angles(x, y, z)
            a, c = geometry.discover_rings(alpha_v, valid, cfg.interval,
                                           rings=rings)
            want_angles.append(a)
            want_counts.append(c)
            alphas.append(jnp.where(valid, alpha_v, jnp.nan))

        got_a, got_c = discover_rings_pallas(jnp.stack(alphas), cfg.interval,
                                             rings, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(got_a), np.stack([np.asarray(a) for a in want_angles]))
        np.testing.assert_array_equal(
            np.asarray(got_c), np.stack([np.asarray(c) for c in want_counts]))

        # The WIDE (one-scan-per-block) kernel — the 262k multi-LiDAR
        # VMEM route, where bb=8 two-buffer residency cannot fit and
        # bb=4 blocks are illegal to lower — must be bit-equal on the
        # same scans (its row-major 8-row layout preserves input order).
        got_aw, got_cw = discover_rings_pallas(
            jnp.stack(alphas), cfg.interval, rings, interpret=True,
            wide=True)
        np.testing.assert_array_equal(np.asarray(got_aw), np.asarray(got_a))
        np.testing.assert_array_equal(np.asarray(got_cw), np.asarray(got_c))
