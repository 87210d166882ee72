"""End-to-end batch-step timing for ingest A/Bs on the real TPU.

Answers two PERF.md round-4 open ends:

  * Does the small-batch (b8) streaming mode regress under the fused
    ingest kernels (3.48 -> ~4.0 ms/scan vs round 3), and does an
    URF_INGEST_COLS re-sweep or the XLA ingest recover it?
  * Is the single-scan p50 drift (28.3 -> 37-40 ms across bench runs)
    reproducible in a clean process, or axon dispatch variance?

One VARIANT per process (a trace-time env knob selects the ingest path;
fresh-process discipline per PERF.md measurement notes) — drive sweeps
from the shell:

  for m in kernels xla; do URF_BATCH_INGEST=$m python tools/bench_ingest.py --batch 8; done
  for c in 4096 8192 16384 32768; do URF_INGEST_COLS=$c python tools/bench_ingest.py --batch 8; done
  python tools/bench_ingest.py --single          # p50 of process_scan_jit

Timing rule: two batches in flight, every result FETCHED (np.asarray) —
block_until_ready does not drain on axon (CLAUDE.md).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--single", action="store_true",
                    help="time process_scan_jit p50 instead of a batch")
    args = ap.parse_args()

    import jax

    from urban_road_filter_tpu.config import FilterConfig, PipelineDims
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
    from urban_road_filter_tpu.pipeline import (pad_scan, process_batch_jit,
                                                process_scan_jit)

    cfg = FilterConfig()
    dims = PipelineDims(max_points=131072, rings=64, ring_capacity=2048,
                        beam_capacity=512)
    b = args.batch
    scans = np.stack([
        pad_scan(make_scan(SCENES["two_curbs" if i % 2 == 0 else
                                  "blind_spot"](),
                           n_rings=64, n_azimuth=2048, seed=i),
                 dims.max_points) for i in range(max(b, 1))])
    pts = jax.numpy.asarray(scans)

    np.asarray(jax.numpy.zeros((8,), jax.numpy.int32))  # tunnel warm-up

    if args.single:
        o1 = process_scan_jit(pts[0], cfg, dims)
        np.asarray(o1.ok)
        lats = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            o1 = process_scan_jit(pts[0], cfg, dims)
            np.asarray(o1.ok)
            lats.append((time.perf_counter() - t0) * 1e3)
        print(f"single-scan p50 {np.percentile(lats, 50):.2f} ms  "
              f"p10 {np.percentile(lats, 10):.2f}  "
              f"p90 {np.percentile(lats, 90):.2f}  (n={args.iters})")
        return

    mode = os.environ.get("URF_BATCH_INGEST", "auto")
    cols = os.environ.get("URF_INGEST_COLS", "8192")
    o = process_batch_jit(pts, cfg, dims)  # compile
    np.asarray(o.ok)
    inflight = [process_batch_jit(pts, cfg, dims)]
    lats = []
    for _ in range(args.iters):
        t0 = time.perf_counter()
        inflight.append(process_batch_jit(pts, cfg, dims))
        np.asarray(inflight.pop(0).ok)
        lats.append((time.perf_counter() - t0) * 1e3)
    np.asarray(inflight.pop(0).ok)
    p50 = float(np.percentile(lats, 50))
    print(f"b{b} ingest={mode} cols={cols}: step p50 {p50:.2f} ms  "
          f"({p50 / b:.3f} ms/scan; p10 {np.percentile(lats, 10):.2f}, "
          f"p90 {np.percentile(lats, 90):.2f}, n={args.iters})")


if __name__ == "__main__":
    main()
