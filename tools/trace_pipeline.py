"""Capture a device trace of the batched pipeline on the real TPU and print
the top op fusions by total device time.

Usage: python tools/trace_pipeline.py [--batch 16] [--out /tmp/urf_trace]

Parses the xplane protobuf via tensorflow's profiler if available; always
leaves the raw trace on disk for manual inspection.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path: str, top: int = 30):
    """Minimal xplane parser: aggregate XEvent durations per event name on
    TPU device planes.  Pure-protobuf-wire decoding, no TF dependency."""

    def read_varint(buf, i):
        shift = 0
        val = 0
        while True:
            b = buf[i]
            i += 1
            val |= (b & 0x7F) << shift
            if not b & 0x80:
                return val, i
            shift += 7

    def fields(buf):
        i = 0
        n = len(buf)
        while i < n:
            key, i = read_varint(buf, i)
            tag, wt = key >> 3, key & 7
            if wt == 0:
                v, i = read_varint(buf, i)
                yield tag, v
            elif wt == 2:
                ln, i = read_varint(buf, i)
                yield tag, buf[i:i + ln]
                i += ln
            elif wt == 5:
                yield tag, buf[i:i + 4]
                i += 4
            elif wt == 1:
                yield tag, buf[i:i + 8]
                i += 8
            else:
                raise ValueError(f"wire type {wt}")

    with open(path, "rb") as f:
        data = f.read()

    totals = {}
    line_totals = {}
    # XSpace{planes=1} / XPlane{name=2, lines=3, event_metadata=4}
    # XLine{name=2, events=4 in this proto build} /
    # XEvent{metadata_id=1, duration_ps=3} / XEventMetadata{id=1, name=2}
    for tag, plane in fields(data):
        if tag != 1:
            continue
        name = ""
        meta = {}
        lines = []
        for t2, v2 in fields(plane):
            if t2 == 2:
                name = v2.decode(errors="replace")
            elif t2 == 3:
                lines.append(v2)
            elif t2 == 4:
                # map<int64, XEventMetadata>
                mid, mname = None, ""
                for t3, v3 in fields(v2):
                    if t3 == 1:
                        mid = v3
                    elif t3 == 2:
                        for t4, v4 in fields(v3):
                            if t4 == 1:
                                mid = v4
                            elif t4 == 2:
                                mname = v4.decode(errors="replace")
                if mid is not None:
                    meta[mid] = mname
        if "TPU" not in name and "tpu" not in name.lower():
            continue
        for line in lines:
            lname = ""
            events = []
            for t3, v3 in fields(line):
                if t3 == 2 and isinstance(v3, bytes):
                    lname = v3.decode(errors="replace")
                elif t3 == 4 and isinstance(v3, bytes):
                    events.append(v3)
            ltot = 0
            for ev in events:
                mid, dur = None, 0
                for t4, v4 in fields(ev):
                    if t4 == 1:
                        mid = v4
                    elif t4 == 3:
                        dur = v4
                ltot += dur
                if lname == "XLA Ops" and mid is not None:
                    key = meta.get(mid, f"#{mid}")
                    totals[key] = totals.get(key, 0) + dur
            if events:
                key = f"{name} :: {lname}"
                line_totals[key] = (line_totals.get(key, (0, 0))[0] + ltot,
                                    line_totals.get(key, (0, 0))[1]
                                    + len(events))
    return sorted(totals.items(), key=lambda kv: -kv[1])[:top], line_totals


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default="/tmp/urf_trace")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    import jax

    from urban_road_filter_tpu.config import FilterConfig, PipelineDims
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
    from urban_road_filter_tpu.pipeline import (pad_scan, planarize_batch,
                                                process_batch_jit)

    cfg = FilterConfig()
    dims = PipelineDims(max_points=131072, rings=64, ring_capacity=2048,
                        beam_capacity=512)
    scans = np.stack([
        pad_scan(make_scan(SCENES["two_curbs" if i % 2 == 0 else "blind_spot"](),
                           n_rings=64, n_azimuth=2048, seed=i),
                 dims.max_points)
        for i in range(args.batch)])
    # Planar staging (round 5, step 36): trace the graph bench.py runs.
    pts = jax.numpy.asarray(planarize_batch(scans))

    np.asarray(jax.numpy.zeros((8,), jax.numpy.int32))  # tunnel warm-up
    out = process_batch_jit(pts, cfg, dims)
    np.asarray(out.ok)
    t0 = time.perf_counter()
    out = process_batch_jit(pts, cfg, dims)
    np.asarray(out.ok)
    step = time.perf_counter() - t0
    print(f"step: {step*1e3:.1f} ms for batch {args.batch} "
          f"({args.batch/step:.1f} scans/s)", flush=True)

    jax.profiler.start_trace(args.out)
    for _ in range(args.iters):
        out = process_batch_jit(pts, cfg, dims)
        np.asarray(out.ok)
    jax.profiler.stop_trace()

    files = sorted(glob.glob(os.path.join(args.out, "**/*.xplane.pb"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("no xplane produced; inspect", args.out)
        return
    rows, line_totals = parse_xplane(files[-1])
    print("plane/line totals (all events):")
    for key, (tot, cnt) in sorted(line_totals.items(), key=lambda kv: -kv[1][0]):
        print(f"  {tot/1e9/args.iters:9.3f} ms/step  {cnt:7d} events  {key[:80]}")
    print(f"top device ops ({files[-1]}), {args.iters} iters:")
    for name, dur_ps in rows:
        ms = dur_ps / 1e9 / args.iters
        print(f"  {ms:9.3f} ms/step  {name[:110]}")


if __name__ == "__main__":
    main()
