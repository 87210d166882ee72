"""TPU streaming soak of the L0 replay loop (VERDICT r3 item 4; r4 item 6
added per-scan latency ATTRIBUTION so the artifact can tell a device
regression from tunnel weather).

The reference *is* a live node: one scan at a time, queue depth 1, scans
dropped when processing lags the sensor (lidar_segmentation.cpp:53).
`ReplayHarness` implements those semantics; this soak proves them ON THE
DEVICE, end-to-end (full 131k-pt scans, postprocess + marker strips on
host), and writes STREAM_r05.json:

  phase "device_floor": depth-2-pipelined single-scan steps, fetch-synced
                    — dispatch/H2D overlap the device step, so the p50
                    approximates the DEVICE+sync cost per scan.  Every
                    other phase's latency minus this is host/tunnel time.
  phase "10hz":     >= 60 s at the sensor rate, drop mode.  On this
                    tunneled backend the serial per-scan wall (one fetch
                    round trip delivering all outputs; ~88 ms p50 with
                    planar staging + single-round-trip fetch, round 5 —
                    was ~315 ms in round 4) sits near the 100 ms period,
                    so a few drops are expected on latency spikes; on a
                    directly-attached TPU the phase should keep up with
                    0 drops.
  phase "overload": ~20 s at 30 Hz — the period is below the per-scan
                    latency, so queue-1 drops MUST engage; proves the
                    drop counter on real hardware.
  phase "flatout":  >= 60 s at rate 0 — the single-scan streaming
                    throughput ceiling (per-scan dispatch NOT amortized:
                    bench.py's batch-8 figure is ~3.5 ms/scan because 8
                    scans share one ~30 ms dispatched step; a 1-scan loop
                    pays the full step per scan).
  phase "10hz_depth2"/"flatout_depth2": the same 10 Hz and flat-out runs
                    with pipeline_depth=2 — dispatch and transfers
                    overlap the device step (bit-identical outputs,
                    TestReplayPipelined); measures what the overlap buys
                    the live node.
  phase "resume":   checkpoint every scan, hard-stop mid-stream, build a
                    FRESH harness on the same checkpoint, finish — seq
                    must land exactly at stream length with no scan
                    processed twice.

Each harness phase carries `breakdown_ms_p50` (dispatch / stage / fetch /
post, utils.metrics.ScanStats): dispatch + stage + fetch == latency per
scan BY CONSTRUCTION, so the accounting is auditable inside the artifact
and the round-4 run's unexplained ~80 ms flat-out residue (315 ms p50 vs
~235 accounted, VERDICT r4 weak #3) is localized to a named component
instead of guessed at.  post (the big label/roi D2H + marker strips) sits
OUTSIDE latency_ms and is the extra serial cost that makes flat-out
scans/s lower than 1000/latency_p50.

Scans come from a 16-scan pregenerated pool cycled to length (host scan
generation is slower than 10 Hz on this 1-core box; the device sees a
fresh buffer every scan regardless).

Usage: python tools/soak_stream.py [--seconds 60] [--out STREAM_r05.json]
Run alone (never overlap TPU jobs).  NOTE: JAX_PLATFORMS=cpu does NOT pin
this tool to CPU on the axon backend (env vars are ignored; only
jax.config works — CLAUDE.md) — a "CPU smoke test" invoked that way runs
on the REAL chip and silently contends with any other TPU job.  Pass
--cpu for a true CPU smoke run.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_pool(n_pool: int = 16):
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan

    scenes = ["two_curbs", "blind_spot", "curb_gap", "wall"]
    return [make_scan(SCENES[scenes[i % len(scenes)]](), n_rings=64,
                      n_azimuth=2048, seed=i) for i in range(n_pool)]


def cycle_source(pool, n):
    return itertools.islice(itertools.cycle(pool), n)


def pcts(metrics):
    s = metrics.summary()
    out = {k: s[k] for k in ("scans", "dropped", "errors", "scans_per_sec")}
    out["latency_ms_p50"] = s["latency_ms"]["p50"]
    out["latency_ms_p99"] = s["latency_ms"]["p99"]
    # dispatch + stage + fetch == latency by construction (ScanStats);
    # post is serial host work outside latency_ms.
    out["breakdown_ms_p50"] = s.get("breakdown_ms_p50", {})
    return out


def device_floor(cfg, dims, pool, n: int = 30) -> dict:
    """p50 of depth-2-pipelined single-scan steps, fetch-synced: with two
    scans in flight the ~25-30 ms dispatch and the H2D of scan t+1 overlap
    the device step on scan t, so the steady-state step approximates the
    DEVICE-side cost per scan (device compute + result sync) — the number
    the harness phases' latency should be compared against to attribute
    tunnel/host overhead (VERDICT r4 item 6)."""
    import jax

    from urban_road_filter_tpu.pipeline import (pad_scan_planar,
                                                process_scan_jit)

    dev = [jax.numpy.asarray(pad_scan_planar(p, dims.max_points))
           for p in pool[:4]]
    o = process_scan_jit(dev[0], cfg, dims)  # compile
    np.asarray(o.ok)
    inflight = [process_scan_jit(dev[0], cfg, dims)]
    steps = []
    for i in range(n):
        t0 = time.perf_counter()
        inflight.append(process_scan_jit(dev[(i + 1) % len(dev)], cfg, dims))
        np.asarray(inflight.pop(0).ok)
        steps.append((time.perf_counter() - t0) * 1e3)
    np.asarray(inflight.pop(0).ok)
    return {"step_ms_p50": round(float(np.percentile(steps, 50)), 2),
            "step_ms_p99": round(float(np.percentile(steps, 99)), 2),
            "n": n}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--out", default="STREAM_r05.json")
    ap.add_argument("--cpu", action="store_true",
                    help="true CPU smoke run (JAX_PLATFORMS env is "
                         "IGNORED by the axon backend; only jax.config "
                         "pins the platform)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        from urban_road_filter_tpu.utils.compile_cache import (
            enable_persistent_cache,
        )

        enable_persistent_cache()

    from urban_road_filter_tpu.config import FilterConfig, PipelineDims
    from urban_road_filter_tpu.io.replay import ReplayHarness

    cfg = FilterConfig()
    dims = PipelineDims(max_points=131072, rings=64, ring_capacity=2048,
                        beam_capacity=512)
    pool = scan_pool()
    result = {"device": None, "points_per_scan": dims.max_points}

    # Warm-up: compile + first D2H outside any timed phase.
    warm = ReplayHarness(cfg, dims)
    warm.run(cycle_source(pool, 2))
    result["device"] = str(jax.devices()[0])

    # Phase 0: device-side per-scan floor (attribution reference).
    result["device_floor"] = device_floor(cfg, dims, pool)

    # Phase 1: sensor rate, drop mode.
    n10 = int(10 * args.seconds)
    h = ReplayHarness(cfg, dims, rate_hz=10.0, drop_when_behind=True)
    t0 = time.perf_counter()
    m = h.run(cycle_source(pool, n10))
    result["10hz"] = {**pcts(m), "wall_s": round(time.perf_counter() - t0, 1)}

    # Phase 2: overload at 30 Hz — queue-1 drops must engage.
    h = ReplayHarness(cfg, dims, rate_hz=30.0, drop_when_behind=True)
    t0 = time.perf_counter()
    m = h.run(cycle_source(pool, int(30 * min(args.seconds, 20.0))))
    result["overload_30hz"] = {**pcts(m),
                               "wall_s": round(time.perf_counter() - t0, 1)}

    # Phase 3: flat-out single-scan streaming.  run() has no wall-clock
    # stop, so size the scan count from the observed p50 latency to land
    # near the requested duration.
    p50 = max(result["10hz"]["latency_ms_p50"], 1.0)
    nf = max(int(args.seconds * 1000.0 / p50), 200)
    h = ReplayHarness(cfg, dims, rate_hz=0.0)
    t0 = time.perf_counter()
    m = h.run(cycle_source(pool, nf))
    result["flatout"] = {**pcts(m),
                         "wall_s": round(time.perf_counter() - t0, 1)}

    # Phases 3b/3c: pipeline_depth=2 — dispatch/transfers overlap the
    # device step (the bench technique, now a harness mode).  Outputs are
    # identical to depth 1 (TestReplayPipelined); these phases measure
    # what the overlap buys the live node on this backend.
    h = ReplayHarness(cfg, dims, rate_hz=10.0, drop_when_behind=True,
                      pipeline_depth=2)
    t0 = time.perf_counter()
    m = h.run(cycle_source(pool, n10))
    result["10hz_depth2"] = {**pcts(m),
                             "wall_s": round(time.perf_counter() - t0, 1)}

    h = ReplayHarness(cfg, dims, rate_hz=0.0, pipeline_depth=2)
    t0 = time.perf_counter()
    m = h.run(cycle_source(pool, nf))
    result["flatout_depth2"] = {**pcts(m),
                                "wall_s": round(time.perf_counter() - t0, 1)}

    # Phase 4: checkpoint/resume across a mid-run restart.
    ckpt = os.path.join(tempfile.mkdtemp(prefix="urf_soak_"), "ckpt.json")
    total = 60
    h1 = ReplayHarness(cfg, dims, checkpoint_path=ckpt)
    m1 = h1.run(cycle_source(pool, total), max_scans=total // 2)
    h2 = ReplayHarness(cfg, dims, checkpoint_path=ckpt)  # fresh process sim
    m2 = h2.run(cycle_source(pool, total))
    s1, s2 = m1.summary(), m2.summary()
    assert s1["scans"] == total // 2, s1
    assert s2["scans"] == total - total // 2, (s1, s2)
    assert h2._seq == total, h2._seq
    result["resume"] = {"first_half_scans": s1["scans"],
                        "second_half_scans": s2["scans"],
                        "final_seq": h2._seq,
                        "errors": s1["errors"] + s2["errors"]}

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
