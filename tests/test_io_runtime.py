"""Tests for PCD I/O, native runtime, replay harness, metrics
(SURVEY.md section 4, item 5: streaming integration)."""

import json
import time
import os

import numpy as np
import pytest

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.pcd import (
    read_pcd,
    read_scan_sequence,
    write_pcd,
    write_scan_sequence,
)
from urban_road_filter_tpu.io.replay import ReplayHarness, scene_source
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan

DIMS = PipelineDims(max_points=8192, rings=64, ring_capacity=1024,
                    beam_capacity=256)


def _timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return out, time.perf_counter() - t0


class TestPcd:
    def test_binary_roundtrip(self, tmp_path):
        pts = np.random.default_rng(0).normal(size=(1000, 4)).astype(np.float32)
        p = tmp_path / "a.pcd"
        write_pcd(p, pts, binary=True)
        got = read_pcd(p, use_native=False)
        np.testing.assert_array_equal(got, pts)

    def test_ascii_roundtrip(self, tmp_path):
        pts = np.random.default_rng(1).normal(size=(200, 4)).astype(np.float32)
        p = tmp_path / "a.pcd"
        write_pcd(p, pts, binary=False)
        got = read_pcd(p, use_native=False)
        np.testing.assert_allclose(got, pts, atol=1e-4)

    def test_native_matches_python(self, tmp_path):
        from urban_road_filter_tpu.runtime.native import get_lib, read_pcd_native

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        pts = np.random.default_rng(2).normal(size=(5000, 4)).astype(np.float32)
        p = tmp_path / "a.pcd"
        write_pcd(p, pts, binary=True)
        np.testing.assert_array_equal(read_pcd_native(str(p)), pts)

    def test_xyz_only_pcd(self, tmp_path):
        # Hand-written 3-field PCD; intensity must be zero-filled.
        p = tmp_path / "b.pcd"
        with open(p, "wb") as f:
            f.write(b"VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                    b"COUNT 1 1 1\nWIDTH 2\nHEIGHT 1\nPOINTS 2\nDATA ascii\n"
                    b"1 2 3\n4 5 6\n")
        got = read_pcd(p, use_native=False)
        np.testing.assert_allclose(got, [[1, 2, 3, 0], [4, 5, 6, 0]])

    def test_native_rejects_hostile_header(self, tmp_path):
        # A corrupt/hostile POINTS value must return an error code, not
        # drive an unchecked multi-GB allocation (ADVICE r1).
        from urban_road_filter_tpu.runtime.native import get_lib, read_pcd_native

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        head = (b"VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                b"COUNT 1 1 1\nWIDTH 1\nHEIGHT 1\nPOINTS %s\nDATA binary\n")
        for bad in (b"99999999999999", b"-5", b"0"):
            p = tmp_path / "bad.pcd"
            with open(p, "wb") as f:
                f.write(head % bad)
                f.write(b"\x00" * 12)  # one point's worth of payload
            with pytest.raises(ValueError):
                read_pcd_native(str(p))

    def test_native_truncated_binary_rejected(self, tmp_path):
        # Declared POINTS larger than the actual payload -> header error.
        from urban_road_filter_tpu.runtime.native import get_lib, read_pcd_native

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        p = tmp_path / "short.pcd"
        with open(p, "wb") as f:
            f.write(b"VERSION 0.7\nFIELDS x y z\nSIZE 4 4 4\nTYPE F F F\n"
                    b"COUNT 1 1 1\nWIDTH 100\nHEIGHT 1\nPOINTS 100\n"
                    b"DATA binary\n")
            f.write(b"\x00" * (12 * 10))  # only 10 of 100 points present
        with pytest.raises(ValueError):
            read_pcd_native(str(p))

    def test_binary_compressed_roundtrip(self, tmp_path):
        # PCL's default save format (LZF over structure-of-arrays).
        pts = np.random.default_rng(4).normal(size=(3000, 4)).astype(np.float32)
        p = tmp_path / "c.pcd"
        write_pcd(p, pts, compressed=True)
        got = read_pcd(p, use_native=False)
        np.testing.assert_array_equal(got, pts)

        # Structured clouds (repeated coordinates) must actually shrink.
        grid = np.tile(pts[:50], (60, 1))
        write_pcd(p, grid, compressed=True)
        assert p.stat().st_size < grid.nbytes // 4
        np.testing.assert_array_equal(read_pcd(p, use_native=False), grid)

    def test_lzf_codec(self):
        from urban_road_filter_tpu.io.pcd import lzf_compress, lzf_decompress

        # Highly repetitive data exercises long (extension-byte) matches;
        # random data exercises literal runs; mixes exercise both.
        rng = np.random.default_rng(0)
        for blob in (b"abcabcabcabcabcabc" * 50,
                     rng.bytes(1000),
                     b"\x00" * 5000,
                     rng.bytes(50) * 40 + rng.bytes(77)):
            comp = lzf_compress(blob)
            assert lzf_decompress(comp, len(blob)) == blob
        assert len(lzf_compress(b"\x00" * 5000)) < 100

    def test_lzf_truncated_backref_raises_valueerror(self):
        # Regression (code review r2): a back-reference cut mid-token
        # (missing length-extension or distance byte) surfaced as a bare
        # IndexError instead of the codec's ValueError contract.
        import pytest

        from urban_road_filter_tpu.io.pcd import lzf_decompress

        with pytest.raises(ValueError):
            lzf_decompress(bytes([7 << 5]), 10)  # missing extension byte
        with pytest.raises(ValueError):
            lzf_decompress(bytes([1 << 5]), 10)  # missing distance byte

    def test_lzf_known_backref_vector(self):
        # Hand-built stream: 3 literals 'abc', then a distance-3 length-6
        # back-reference (overlapping copy) -> 'abcabcabcabc'... checks the
        # decoder against the liblzf wire format independently of our
        # compressor.
        from urban_road_filter_tpu.io.pcd import lzf_decompress

        stream = bytes([0x02]) + b"abc" + bytes([(7 << 5) | 0, 9 - 7, 2])
        # ctrl=(7<<5)|hi(dist=2->0), ext=length-7 where length=m-2=9, lo=2
        assert lzf_decompress(stream, 14) == b"abc" + b"abcabcabcab"

    def test_native_lzf_fuzz_vs_python(self):
        # The native decoder (urf_native.cpp lzf_decompress) must be
        # byte-identical to the Python codec on valid streams and reject
        # the same malformed ones (VERDICT r2 item 6).
        from urban_road_filter_tpu.io.pcd import lzf_compress, lzf_decompress
        from urban_road_filter_tpu.runtime.native import (
            get_lib, lzf_decompress_native)

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(7)
        blobs = [rng.bytes(1), b"", b"\x00" * 10000, rng.bytes(4096),
                 rng.bytes(64) * 100,
                 np.arange(20000, dtype=np.float32).tobytes(),
                 bytes(rng.integers(0, 4, 30000, dtype=np.uint8))]
        for blob in blobs:
            comp = lzf_compress(blob)
            assert lzf_decompress_native(comp, len(blob)) == blob
            assert lzf_decompress(comp, len(blob)) == blob
        for bad in (bytes([7 << 5]), bytes([1 << 5]),
                    bytes([0x02]) + b"ab",  # literal run past end
                    bytes([0x00, 0x61, (1 << 5), 0x63])):  # ref before start
            with pytest.raises(ValueError):
                lzf_decompress_native(bad, 64)
            with pytest.raises(ValueError):
                lzf_decompress(bad, 64)

    def test_native_binary_compressed_parse(self, tmp_path):
        # PCL's DEFAULT save format through the native fast path: equal to
        # the Python reader, and fast enough for streaming (VERDICT r2
        # item 6: a 262k-pt compressed scan formerly fell to a per-byte
        # Python loop costing seconds).
        import time

        from urban_road_filter_tpu.runtime.native import (
            get_lib, read_pcd_native)

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        rng = np.random.default_rng(5)
        pts = rng.normal(size=(262144, 4)).astype(np.float32)
        p = tmp_path / "big.pcd"
        write_pcd(p, pts, compressed=True)
        # Best-of-3 wall time: the absolute threshold tripped at 386 ms
        # when the FULL suite saturated a 1-core host (the parse itself is
        # ~40 ms; all scheduling noise is additive, so the minimum is the
        # honest figure — same rule as the device probes, CLAUDE.md).
        dt = min(_timed(lambda: read_pcd_native(str(p)))[1]
                 for _ in range(3))
        got = read_pcd_native(str(p))
        np.testing.assert_array_equal(got, pts)
        np.testing.assert_array_equal(read_pcd(p, use_native=False), pts)
        assert dt < 0.25, f"native compressed parse took {dt * 1e3:.0f} ms"

    def test_npz_sequence(self, tmp_path):
        scans = [np.random.rand(100 + i, 4).astype(np.float32) for i in range(3)]
        p = tmp_path / "seq.npz"
        write_scan_sequence(p, scans)
        got = list(read_scan_sequence(p))
        assert len(got) == 3
        for a, b in zip(got, scans):
            np.testing.assert_array_equal(a, b)


class TestNativeStaging:
    def test_stage_batch(self):
        from urban_road_filter_tpu.runtime.native import get_lib, stage_batch_native

        if get_lib() is None:
            pytest.skip("native toolchain unavailable")
        scans = [np.random.rand(50, 4).astype(np.float32),
                 np.random.rand(20, 4).astype(np.float32)]
        out = stage_batch_native(scans, 64)
        assert out.shape == (2, 64, 4)
        np.testing.assert_array_equal(out[0, :50], scans[0])
        assert not out[1, 20:].any()


class TestConfigFiles:
    def test_yaml_roundtrip(self):
        cfg = FilterConfig(beam_zone=17.5, x_zero_method=False)
        assert FilterConfig.from_yaml(cfg.to_yaml()) == cfg

    def test_from_file_by_extension(self, tmp_path):
        cfg = FilterConfig(curb_height=0.123)
        py = tmp_path / "c.yaml"
        py.write_text(cfg.to_yaml())
        pj = tmp_path / "c.json"
        pj.write_text(cfg.to_json())
        assert FilterConfig.from_file(str(py)) == cfg
        assert FilterConfig.from_file(str(pj)) == cfg

    def test_yaml_rejects_unknown_keys_and_non_mapping(self):
        with pytest.raises(ValueError):
            FilterConfig.from_yaml("no_such_param: 1\n")
        with pytest.raises(ValueError):
            FilterConfig.from_yaml("- just\n- a list\n")


class TestReplay:
    def test_stream_runs_and_reports(self, tmp_path):
        h = ReplayHarness(dims=DIMS)
        m = h.run(scene_source("two_curbs", n_scans=4, n_rings=16,
                               n_azimuth=256), max_scans=4)
        s = m.summary()
        assert s["scans"] == 4 and s["not_ok"] == 0
        assert s["latency_ms"]["p50"] > 0

    def test_outputs_have_five_topics(self):
        got = []
        h = ReplayHarness(dims=DIMS, on_scan=got.append)
        h.run(scene_source("two_curbs", n_scans=1, n_rings=16, n_azimuth=256),
              max_scans=1)
        o = got[0]
        assert o.ok
        assert len(o.roi) > len(o.road) > 0
        assert len(o.curb) > 0
        assert o.stats.num_rings > 0
        # marker strips assembled when >2 markers
        assert isinstance(o.marker_strips, list)

    def test_dropped_scans_never_staged(self, monkeypatch):
        """Queue-1 drop semantics must be FREE: a dropped scan is consumed
        raw, never padded/device_put (the reference discards the unparsed
        message, lidar_segmentation.cpp:53; on a tunneled backend staging
        costs ~180 ms/scan — round-4 soak finding)."""
        h = ReplayHarness(dims=DIMS, rate_hz=1000.0, drop_when_behind=True)
        staged = []
        orig = ReplayHarness._to_device

        def counting(self, raw):
            staged.append(1)
            time.sleep(0.01)  # 10 ms per scan >> the 1 ms period: must lag
            return orig(self, raw)

        monkeypatch.setattr(ReplayHarness, "_to_device", counting)
        m = h.run(scene_source("flat", n_scans=40, n_rings=16,
                               n_azimuth=256))
        s = m.summary()
        assert s["dropped"] > 0, s
        assert s["scans"] + s["dropped"] + s["errors"] == 40
        # Every staging call fed a processed scan, except the one
        # already-staged scan a drop burst discards (sunk cost of the
        # stage-ahead overlap); the 39 drops paid nothing.
        assert len(staged) <= s["scans"] + 1, (len(staged), s)
        assert h._seq == 40  # checkpoint accounting covers drops

    def test_checkpoint_resume(self, tmp_path):
        ck = str(tmp_path / "ck.json")
        h1 = ReplayHarness(dims=DIMS, checkpoint_path=ck)
        h1.run(scene_source("flat", n_scans=5, n_rings=16, n_azimuth=256),
               max_scans=2)
        state = json.load(open(ck))
        assert state["seq"] == 2

        h2 = ReplayHarness(dims=DIMS, checkpoint_path=ck)
        seen = []
        h2.on_scan = lambda o: seen.append(o.seq)
        h2.run(scene_source("flat", n_scans=5, n_rings=16, n_azimuth=256),
               max_scans=2)
        assert seen == [2, 3]  # resumed mid-stream

    def test_checkpoint_invalidated_by_config_change(self, tmp_path):
        ck = str(tmp_path / "ck.json")
        h1 = ReplayHarness(dims=DIMS, checkpoint_path=ck)
        h1.run(scene_source("flat", n_scans=3, n_rings=16, n_azimuth=256),
               max_scans=1)
        h2 = ReplayHarness(cfg=FilterConfig(beam_zone=50.0), dims=DIMS,
                           checkpoint_path=ck)
        seen = []
        h2.on_scan = lambda o: seen.append(o.seq)
        h2.run(scene_source("flat", n_scans=3, n_rings=16, n_azimuth=256),
               max_scans=1)
        assert seen == [0]  # config hash mismatch -> stream restarted

    def test_scan_larger_than_capacity_truncates(self):
        # Sensors can emit more returns than max_points; the harness must
        # process the truncated prefix, not crash on index mismatch.
        big = make_scan(SCENES["flat"](), n_rings=24, n_azimuth=384, seed=3)
        assert len(big) > DIMS.max_points
        got = []
        h = ReplayHarness(dims=DIMS, on_scan=got.append)
        h.run(iter([big]), max_scans=1)
        o = got[0]
        assert o.ok
        assert o.stats.points_in == DIMS.max_points
        assert len(o.roi) <= DIMS.max_points

    def test_malformed_scan_mid_stream_is_isolated(self):
        # Per-scan fault isolation (SURVEY.md section 5): one bad scan from
        # a source must be counted as an error, not abort the stream.
        good = make_scan(SCENES["flat"](), n_rings=16, n_azimuth=256, seed=0)
        bad = np.zeros((100,), np.float32)  # 1-D: pad_scan cannot shape it
        got = []
        h = ReplayHarness(dims=DIMS, on_scan=got.append)
        m = h.run(iter([good, bad, good]))
        s = m.summary()
        assert s["scans"] == 2 and s["errors"] == 1
        assert [o.seq for o in got] == [0, 2]  # errored scan consumed a seq
        assert "stage:" in m.last_error

    def test_trailing_malformed_scans_charged_to_checkpoint(self, tmp_path):
        # ADVICE r2: malformed scans at the END of a stream are consumed
        # from the source; the checkpoint seq must count them, or a resumed
        # run would re-consume and re-error those positions.
        ck = str(tmp_path / "ck.json")
        good = make_scan(SCENES["flat"](), n_rings=16, n_azimuth=256, seed=0)
        bad = np.zeros((100,), np.float32)
        h = ReplayHarness(dims=DIMS, checkpoint_path=ck)
        m = h.run(iter([good, bad, bad]))
        assert m.summary()["scans"] == 1 and m.summary()["errors"] == 2
        state = json.load(open(ck))
        assert state["seq"] == 3  # 1 processed + 2 trailing errored

    def test_packed_wire_format(self):
        """The harness's default device path packs labels/roi/probably_road
        into one uint8 plane (3x less output D2H); unpacking must be
        bit-equal to the full ScanResult surface."""
        from urban_road_filter_tpu.pipeline import (
            pad_scan_planar, packed_scan_jit, process_scan_jit,
            unpack_planes)

        cfg = FilterConfig()
        scan = make_scan(SCENES["two_curbs"](), n_rings=16, n_azimuth=256,
                         seed=4)
        pts = pad_scan_planar(scan, DIMS.max_points)
        ref = process_scan_jit(pts, cfg, DIMS)
        packed, markers, ok, rings, overflow = packed_scan_jit(pts, cfg,
                                                               DIMS)
        labels, roi, prob = unpack_planes(np.asarray(packed))
        np.testing.assert_array_equal(labels, np.asarray(ref.labels))
        np.testing.assert_array_equal(roi, np.asarray(ref.roi))
        np.testing.assert_array_equal(prob, np.asarray(ref.probably_road))
        np.testing.assert_array_equal(np.asarray(markers),
                                      np.asarray(ref.markers))
        assert bool(ok) == bool(ref.ok)
        assert int(rings) == int(ref.num_rings)
        assert int(overflow) == int(ref.overflow)

    def test_viz_renders(self, tmp_path):
        pytest.importorskip("matplotlib")
        from urban_road_filter_tpu.viz import save_scan_png

        got = []
        h = ReplayHarness(dims=DIMS, on_scan=got.append)
        h.run(scene_source("two_curbs", n_scans=1, n_rings=16, n_azimuth=256),
              max_scans=1)
        out = tmp_path / "scan.png"
        save_scan_png(got[0], str(out))
        assert out.stat().st_size > 10000

    def test_live_viewer_follow_headless(self, tmp_path):
        """LiveViewer (rviz follow analogue, VERDICT r2 missing-item 6):
        headless mode writes one frame per redraw into out_dir, reusing a
        single persistent figure; rate_hz=0 disables the throttle."""
        pytest.importorskip("matplotlib")
        import matplotlib

        matplotlib.use("Agg", force=True)
        from urban_road_filter_tpu.viz import LiveViewer

        v = LiveViewer(rate_hz=0.0, out_dir=str(tmp_path / "frames"))
        h = ReplayHarness(dims=DIMS, on_scan=v)
        m = h.run(scene_source("two_curbs", n_scans=3, n_rings=16,
                               n_azimuth=256), max_scans=3)
        v.close()
        frames = sorted((tmp_path / "frames").glob("frame_*.png"))
        assert m.summary()["scans"] == 3 and len(frames) == 3
        assert all(f.stat().st_size > 5000 for f in frames)

    def test_live_viewer_throttles(self):
        pytest.importorskip("matplotlib")
        import matplotlib

        matplotlib.use("Agg", force=True)
        from urban_road_filter_tpu.viz import LiveViewer

        got = []
        h = ReplayHarness(dims=DIMS, on_scan=got.append)
        h.run(scene_source("two_curbs", n_scans=1, n_rings=16,
                           n_azimuth=256), max_scans=1)
        v = LiveViewer(rate_hz=1e-3, out_dir=None)  # ~one frame per 1000 s
        for _ in range(5):
            v(got[0])
        v.close()
        assert v.frames_drawn == 1


class TestReplayPipelined:
    """pipeline_depth >= 2: identical outputs/ordering/isolation to the
    depth-1 (reference queue-1) loop, with dispatch/transfers overlapping
    the device step."""

    def _scans(self, n):
        return [make_scan(SCENES["two_curbs" if i % 2 else "curb_gap"](),
                          n_rings=16, n_azimuth=256, seed=i)
                for i in range(n)]

    def test_outputs_bit_equal_to_depth1(self):
        scans = self._scans(5)
        got1, got2 = [], []
        ReplayHarness(dims=DIMS, on_scan=got1.append).run(iter(scans))
        ReplayHarness(dims=DIMS, on_scan=got2.append,
                      pipeline_depth=2).run(iter(scans))
        assert [o.seq for o in got1] == [o.seq for o in got2]
        for a, b in zip(got1, got2):
            assert a.ok == b.ok
            np.testing.assert_array_equal(a.road, b.road)
            np.testing.assert_array_equal(a.curb, b.curb)
            np.testing.assert_array_equal(a.roi, b.roi)
            np.testing.assert_array_equal(a.road_probably, b.road_probably)
            assert a.stats.num_rings == b.stats.num_rings
            assert a.stats.marker_count == b.stats.marker_count

    def test_latency_invariant_and_overlap(self):
        got = []
        h = ReplayHarness(dims=DIMS, on_scan=got.append, pipeline_depth=3)
        m = h.run(iter(self._scans(6)))
        s = m.summary()
        assert s["scans"] == 6 and s["errors"] == 0
        for o in got:
            st = o.stats
            # dispatch + stage + fetch == latency at any depth (stage is
            # 0 by definition when staging is fully overlapped).
            assert st.stage_ms == 0.0
            np.testing.assert_allclose(
                st.dispatch_ms + st.fetch_ms, st.latency_ms, rtol=1e-6)

    def test_drops_engage_and_accounting_holds(self, monkeypatch):
        h = ReplayHarness(dims=DIMS, rate_hz=1000.0, drop_when_behind=True,
                          pipeline_depth=2)
        orig = ReplayHarness._to_device

        def slow(self, raw):
            time.sleep(0.01)  # 10 ms >> the 1 ms period: must lag
            return orig(self, raw)

        monkeypatch.setattr(ReplayHarness, "_to_device", slow)
        m = h.run(scene_source("flat", n_scans=40, n_rings=16,
                               n_azimuth=256))
        s = m.summary()
        assert s["dropped"] > 0, s
        assert s["scans"] + s["dropped"] + s["errors"] == 40
        assert h._seq == 40  # every stream position charged exactly once

    def test_checkpoint_resume_depth2(self, tmp_path):
        ck = str(tmp_path / "ck.json")
        h1 = ReplayHarness(dims=DIMS, checkpoint_path=ck, pipeline_depth=2)
        h1.run(scene_source("flat", n_scans=6, n_rings=16, n_azimuth=256),
               max_scans=3)
        assert json.load(open(ck))["seq"] == 3
        seen = []
        h2 = ReplayHarness(dims=DIMS, checkpoint_path=ck, pipeline_depth=2,
                           on_scan=lambda o: seen.append(o.seq))
        h2.run(scene_source("flat", n_scans=6, n_rings=16, n_azimuth=256))
        assert seen == [3, 4, 5]  # resumed mid-stream, no scan twice

    def test_malformed_isolated_depth2(self):
        good = make_scan(SCENES["flat"](), n_rings=16, n_azimuth=256, seed=0)
        bad = np.zeros((100,), np.float32)
        got = []
        h = ReplayHarness(dims=DIMS, on_scan=got.append, pipeline_depth=2)
        m = h.run(iter([good, bad, good, bad]))
        s = m.summary()
        assert s["scans"] == 2 and s["errors"] == 2
        assert [o.seq for o in got] == [0, 2]
        assert h._seq == 4  # trailing malformed charged at stream end


class TestCompileCache:
    """enable_persistent_cache (utils/compile_cache.py): the cold-start
    amortization entry points opt into (VERDICT r4 item 7)."""

    def test_env_zero_disables(self, monkeypatch):
        from urban_road_filter_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        monkeypatch.setenv("URF_COMPILE_CACHE", "0")
        assert enable_persistent_cache() is None

    def test_sets_jax_config_and_creates_dir(self, tmp_path, monkeypatch):
        import jax

        from urban_road_filter_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        monkeypatch.delenv("URF_COMPILE_CACHE", raising=False)
        prev = jax.config.jax_compilation_cache_dir
        try:
            want = str(tmp_path / "cache")
            got = enable_persistent_cache(want)
            assert got == want and os.path.isdir(want)
            assert jax.config.jax_compilation_cache_dir == want
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)

    def test_env_dir_wins_over_default(self, tmp_path, monkeypatch):
        import jax

        from urban_road_filter_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        want = str(tmp_path / "envcache")
        monkeypatch.setenv("URF_COMPILE_CACHE", want)
        prev = jax.config.jax_compilation_cache_dir
        try:
            assert enable_persistent_cache() == want
        finally:
            jax.config.update("jax_compilation_cache_dir", prev)
