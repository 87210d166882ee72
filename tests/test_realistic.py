"""Realistic-sensor corpus validation (VERDICT r3 item 3).

The reference's de-facto validation is a 3.3 GB recorded campus rosbag
replayed on a 2x OS1-64 + 2x Velodyne rig (reference README.md:36-46,
config/demo1.rviz:91-181).  That bag cannot be fetched here, so
`io/synthetic.py`'s sensor emulator substitutes the sensor-level
properties real clouds have and the piecewise-flat scene sampler does
not: irregular beam-elevation tables, per-beam azimuth offsets,
rotation-rate azimuth-density skew, per-point beam-pointing jitter,
structured dropout (weak beams, range falloff, burst sectors,
vegetation transmission) and vehicle/vegetation clutter.

Gates here: the emulator produces those properties; oracle <-> JAX
pipeline label parity >= 99.9 % on a procedural drive for all three
sensor models; the compiled reference C++ (tools/golden) agrees with the
oracle on emulated scans; and a recorded-style drive bag replays through
the L0 harness.  Ring-discovery behavior under irregular elevation
spacing is documented in PARITY.md item 13.
"""

import os

import numpy as np
import pytest

from conftest import assert_label_parity, assert_marker_rows
from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import (SENSORS, SceneSpec,
                                                make_drive, make_sensor_scan)
from urban_road_filter_tpu.oracle import reference as oracle_mod

pytestmark = pytest.mark.slow  # emulated-drive corpus + golden-C++ cross-checks
from urban_road_filter_tpu.oracle import run_oracle
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit

# Same dims as test_pipeline_parity so the jit cache is shared across the
# two files within one pytest process.
DIMS = PipelineDims(max_points=16384, rings=64, ring_capacity=1024,
                    beam_capacity=256)

# Reduced firing counts keep single-core CI fast while preserving every
# sensor-model property (the full-rate scans are exercised on the TPU by
# bench.py's device parity gate).
FIRINGS = {"vlp16": 512, "os1_64": 256, "os1_128": 128}


@pytest.fixture(scope="module")
def drive_scans():
    return {name: list(make_drive(4, sensor=name, seed=11,
                                  firings=FIRINGS[name]))
            for name in SENSORS}


def _valid(pts):
    return pts[np.any(pts[:, :3] != 0.0, axis=1)]


class TestSensorModel:
    """The emulator must actually produce the real-cloud properties the
    synthetic flat sampler lacks — otherwise the parity gates below prove
    nothing new."""

    def test_beam_tables_irregular(self):
        os1 = np.asarray(SENSORS["os1_64"].elevations_deg)
        gaps = np.diff(np.sort(os1))
        # Gradient profile: denser at the horizon than at the FOV edge.
        assert gaps.max() / gaps.min() > 1.8
        vlp = np.asarray(SENSORS["vlp16"].elevations_deg)
        # Datasheet firing order interleaves the fan: signs alternate.
        assert (np.sign(vlp[:-1]) != np.sign(vlp[1:])).all()
        assert vlp.min() == -15.0 and vlp.max() == 15.0

    def test_azimuth_density_skew(self):
        pts = _valid(make_sensor_scan(SceneSpec(), "os1_64", seed=5))
        az = np.arctan2(pts[:, 1], pts[:, 0])
        counts, _ = np.histogram(az, bins=24, range=(-np.pi, np.pi))
        counts = counts[counts > 0]
        # Rotation-rate jitter makes azimuth density non-uniform.
        assert counts.max() > 1.03 * counts.min()

    @pytest.mark.parametrize("name", sorted(SENSORS))
    def test_range_clamp_and_dropout(self, name):
        spec = SceneSpec(wall_x=18.0,
                         vegetation=((8.0, -5.0, -1.0, 1.5),))
        pts = make_sensor_scan(spec, name, seed=7)
        v = _valid(pts)
        r = np.linalg.norm(v[:, :3], axis=1)
        assert r.max() <= SENSORS[name].max_range
        missing = 1.0 - len(v) / len(pts)
        assert 0.05 < missing < 0.75  # structured dropout is present

    def test_upward_beams_return_off_wall(self):
        """VLP-16's +deg beams exercise the z >= 0 vertical-angle branch
        (reference lidar_segmentation.cpp:151-166); they only return when
        something tall is in view."""
        flat = _valid(make_sensor_scan(SceneSpec(), "vlp16", seed=2))
        wall = _valid(make_sensor_scan(SceneSpec(wall_x=15.0), "vlp16",
                                       seed=2))
        assert wall[:, 2].max() > 1.0 > flat[:, 2].max()

    def test_burst_dropout_sectors(self):
        pts = make_sensor_scan(SceneSpec(), "os1_64", seed=9, n_bursts=4)
        miss = np.all(pts[:, :3] == 0.0, axis=1).reshape(
            -1, len(SENSORS["os1_64"].elevations_deg))
        per_firing = miss.mean(axis=1)
        # Burst sectors blank (nearly) whole firings.
        assert (per_firing > 0.8).sum() >= 3

    def test_deterministic(self):
        a = make_sensor_scan(SceneSpec(), "vlp16", seed=3)
        b = make_sensor_scan(SceneSpec(), "vlp16", seed=3)
        assert np.array_equal(a, b)


class TestDriveParity:
    """Oracle <-> JAX pipeline label parity on the procedural drive, all
    sensor models (the VERDICT r3 item-3 gate)."""

    @pytest.mark.parametrize("name", sorted(SENSORS))
    def test_drive_scans(self, name, drive_scans):
        cfg = FilterConfig()
        for i, pts in enumerate(drive_scans[name]):
            o = run_oracle(pts, cfg)
            jx = process_scan_jit(pad_scan(pts, DIMS.max_points), cfg, DIMS)
            assert int(jx.overflow) == 0
            assert int(jx.num_rings) == o.num_rings
            assert bool(jx.ok) == o.ok
            jl = np.asarray(jx.labels)[:len(pts)]
            got = jl[np.asarray(o.roi_mask)]
            assert_label_parity(got, o.labels, 0.999,
                                f"{name} drive scan {i}")

    def test_markers_on_emulated_scan(self, drive_scans):
        from urban_road_filter_tpu.ops.markers import compact_markers

        cfg = FilterConfig()
        pts = drive_scans["os1_64"][0]
        o = run_oracle(pts, cfg)
        jx = process_scan_jit(pad_scan(pts, DIMS.max_points), cfg, DIMS)
        rows, bins = compact_markers(jx.markers)
        assert np.array_equal(bins, o.marker_bins)
        assert_marker_rows(rows, o.marker_points, "emulated os1_64 markers")

    def test_ring_discovery_under_jitter(self, drive_scans):
        """Irregular spacing + pointing jitter: greedy discovery still
        yields one ring per in-ROI beam for OS1-64 (0.44 deg center gaps
        >> 0.18 interval + 3 sigma jitter); PARITY.md item 13 documents the
        OS1-128 near-threshold regime."""
        cfg = FilterConfig()
        for pts in drive_scans["os1_64"]:
            keep = oracle_mod.roi_mask(pts, cfg)
            p = pts[keep]
            _, av = oracle_mod.vertical_angles(p[:, 0], p[:, 1], p[:, 2])
            reps = oracle_mod.discover_rings(av, cfg.interval)
            gaps = np.diff(np.sort(reps))
            assert gaps.min() > cfg.interval  # no duplicate/split rings


@pytest.fixture(scope="module")
def full_binary():
    import sys

    sys.path.insert(0, "tools/golden")
    import runner

    try:
        binary = runner.build_full()
    except Exception as e:  # pragma: no cover - toolchain missing
        pytest.skip(f"golden toolchain unavailable: {e}")
    return runner, binary


class TestGoldenRealistic:
    """Compiled reference C++ (Detector::filtered) vs oracle on emulated
    scans — extends test_golden_cpp's synthetic-scene coverage to the
    sensor-emulated corpus."""

    @staticmethod
    def _golden_vs_oracle(runner, binary, pts, cfg, name):
        res = runner.full(binary, [pts], cfg)[0]
        o = run_oracle(pts, cfg)
        assert res.published == o.ok
        roi_ids = np.flatnonzero(o.roi_mask)
        got = np.zeros(len(pts), np.int8)
        got[res.road_ids] = 1
        got[res.curb_ids] = 2
        want = np.zeros(len(pts), np.int8)
        want[roi_ids[o.road_ids]] = 1
        want[roi_ids[o.curb_ids]] = 2
        agree = float(np.mean(got == want))
        assert agree >= 0.999, f"{name}: label map agreement {agree:.5f}"

    # os1_128 included since round 5 (VERDICT r4 item 4a): its 0.20-0.63 deg
    # gradient gaps are the near-threshold ring-discovery regime of PARITY
    # item 13 — exactly where oracle-vs-C++ divergence is most plausible.
    @pytest.mark.parametrize("name", ["vlp16", "os1_64", "os1_128"])
    def test_label_maps_match_oracle(self, name, full_binary, drive_scans):
        runner, binary = full_binary
        self._golden_vs_oracle(runner, binary, drive_scans[name][1],
                               FilterConfig(), name)


@pytest.fixture(scope="module")
def mixed_rig_scan():
    """One merged OS1-64 + VLP-16 cloud (VERDICT r4 item 4b).  The
    reference's actual rig is multi-sensor (2x OS1-64 + 2x Velodyne,
    reference config/demo1.rviz:91-181) feeding the node ONE pre-merged
    topic; a gradient beam table interleaved with a uniform fan — plus the
    z-offset smearing of the translated sensor's vertical angles — is a
    harder ring-discovery case than either sensor alone (PARITY item 13)."""
    from urban_road_filter_tpu.io.multi_lidar import Extrinsics, merge_scans

    spec = SceneSpec(curb_right_y=3.4, curb_left_y=-3.3, curb_height=0.17,
                     vehicles=((14.0, 2.4, 2.2, 0.85, 1.5),),
                     vegetation=((9.0, -5.2, -1.1, 1.2),))
    os1 = make_sensor_scan(spec, "os1_64", seed=51, firings=512)
    vlp = make_sensor_scan(spec, "vlp16", seed=52, firings=512)
    return merge_scans(
        [os1, vlp],
        [Extrinsics(x=0.4, y=0.3, z=0.0, yaw_deg=1.5),
         Extrinsics(x=-0.4, y=-0.3, z=-0.35, yaw_deg=-2.0)])


class TestMixedRig:
    """Merged mixed-sensor cloud through oracle, JAX pipeline and compiled
    reference C++ (VERDICT r4 item 4b / missing #4)."""

    # 64-ring cap matches the reference's channels=64
    # (lidar_segmentation.cpp:4): both oracle and pipeline drop points
    # beyond the first 64 greedily-registered rings identically.
    MDIMS = PipelineDims(max_points=65536, rings=64, ring_capacity=2048,
                         beam_capacity=512)

    def test_mixed_tables_interleave(self, mixed_rig_scan):
        # The merged cloud must actually exercise the mixed-table regime:
        # more rings than either sensor contributes alone, with sub-interval
        # structure from the z-offset smearing (greedy order resolves it).
        cfg = FilterConfig()
        keep = oracle_mod.roi_mask(mixed_rig_scan, cfg)
        p = mixed_rig_scan[keep]
        _, av = oracle_mod.vertical_angles(p[:, 0], p[:, 1], p[:, 2])
        reps = oracle_mod.discover_rings(av, cfg.interval)
        assert len(reps) > 24  # both sensors' fans are represented

    def test_oracle_parity_on_merged_cloud(self, mixed_rig_scan):
        cfg = FilterConfig()
        o = run_oracle(mixed_rig_scan, cfg)
        assert o.ok
        jx = process_scan_jit(pad_scan(mixed_rig_scan, self.MDIMS.max_points),
                              cfg, self.MDIMS)
        assert int(jx.overflow) == 0
        assert int(jx.num_rings) == o.num_rings
        jl = np.asarray(jx.labels)[:len(mixed_rig_scan)]
        got = jl[np.asarray(o.roi_mask)]
        assert_label_parity(got, o.labels, 0.999, "mixed OS1-64+VLP-16 rig")

    def test_golden_cpp_on_merged_cloud(self, mixed_rig_scan, full_binary):
        runner, binary = full_binary
        TestGoldenRealistic._golden_vs_oracle(
            runner, binary, mixed_rig_scan, FilterConfig(), "mixed rig")

    def test_parity_gate_at_128_rings(self):
        """Full device_parity_gate (labels classified + markers enveloped)
        on a merged dual-OS1-64 cloud at 128-ring dims with a 128-channel
        oracle — the bench multi_lidar_262k pair's regime at CI size.

        Pins the PARITY item 13 interval-envelope classification: in the
        >64-ring mixed-table regime adjacent sorted rings sit closer than
        the matching interval, so a 1-2 ulp vertical-angle (arcsin tail)
        difference between compiled graphs re-keys a point to the
        neighboring ring, lands it in a different z-zero window, and flips
        its label plus the marker row it wins — observed as exactly one
        such flip on this cloud on the CPU backend.  nudged_config's
        interval nudge must classify that cascade as boundary, not
        systematic."""
        from urban_road_filter_tpu.io.multi_lidar import (Extrinsics,
                                                          merge_scans)
        from urban_road_filter_tpu.utils.parity import device_parity_gate

        exts = [Extrinsics(x=0.4, y=0.3, z=0.0, yaw_deg=1.5),
                Extrinsics(x=-0.4, y=-0.3, z=-0.05, yaw_deg=-2.0)]
        sp = SceneSpec(curb_right_y=3.3, curb_left_y=-3.4, curb_height=0.15,
                       vehicles=((12.0, 2.3, 2.2, 0.85, 1.5),),
                       vegetation=((8.0, -5.0, -1.2, 1.2),))
        m = merge_scans(
            [make_sensor_scan(sp, "os1_64", seed=70, firings=256),
             make_sensor_scan(sp, "os1_64", seed=71, firings=256)], exts)
        cfg = FilterConfig()
        dims = PipelineDims(max_points=32768, rings=128, ring_capacity=512,
                            beam_capacity=256)
        out = process_scan_jit(pad_scan(m, dims.max_points), cfg, dims)
        agree, n_sys = device_parity_gate(
            m, np.asarray(out.labels), np.asarray(out.markers), cfg,
            "mixed-rig-128", channels=dims.rings)
        assert agree >= 0.999, agree
        assert n_sys == 0, n_sys


class TestDriveBag:
    """Recorded-style drive bag through the L0 replay harness: the
    emulated analogue of the reference's campus-rosbag replay."""

    def test_write_replay_drive_bag(self, tmp_path):
        from urban_road_filter_tpu.io.replay import ReplayHarness, bag_source
        from urban_road_filter_tpu.io.rosbag import write_bag

        scans = list(make_drive(5, sensor="vlp16", seed=4,
                                firings=FIRINGS["vlp16"]))
        bag = str(tmp_path / "drive.bag")
        write_bag(bag, scans, topic="/velodyne/points", rate_hz=10.0)
        h = ReplayHarness(dims=DIMS)
        m = h.run(bag_source(bag))
        assert m.scans == 5
        assert m.errors == 0 and m.dropped == 0


class TestLongDrive:
    """Multi-scan drive soak: oracle parity across a longer, evolving
    street (parked cars enter/leave, gaps pass, curbs meander).

    Runs 12 scans in the normal slow tier (VERDICT r4 weak #2: the former
    URF_SLOW-only gate ran in NO CI tier); URF_SLOW=1 (the nightly CI job)
    extends the drive to the full 40 scans."""

    def test_long_drive_parity(self):
        cfg = FilterConfig()
        bad = []
        n_scans = 40 if os.environ.get("URF_SLOW") else 12
        for i, pts in enumerate(make_drive(n_scans, sensor="os1_64", seed=21,
                                           firings=FIRINGS["os1_64"])):
            o = run_oracle(pts, cfg)
            jx = process_scan_jit(pad_scan(pts, DIMS.max_points), cfg, DIMS)
            jl = np.asarray(jx.labels)[:len(pts)]
            got = jl[np.asarray(o.roi_mask)]
            agree = float(np.mean(got == o.labels)) if len(o.labels) else 1.0
            if agree < 0.999 or int(jx.overflow) or \
                    int(jx.num_rings) != o.num_rings:
                bad.append((i, agree, int(jx.overflow)))
        assert not bad, f"scans failing the 0.999 gate: {bad}"
