"""Isolated star-stage bench on the real TPU: the 2-key sort + the Pallas
walk kernel, batched, fetch-synced.  Sweeps the kernel's rows-per-block.

Usage: python tools/bench_star.py [--rows 32 64 128] [--batch 128]

Run from /root/repo (no PYTHONPATH — axon).  Follows the bench sync rules
from CLAUDE.md (fetch a result, two batches in flight not needed here —
isolated stage timings are floors anyway).
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--bps", type=int, nargs="+", default=[1],
                    help="blocks-per-step folds to sweep (per rows value)")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--sort-only", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from urban_road_filter_tpu.config import FilterConfig
    from urban_road_filter_tpu.constants import STAR_KFI, STAR_REP
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
    from urban_road_filter_tpu.oracle import reference as oracle
    from urban_road_filter_tpu.ops.star_scan import star_scan_pallas
    from urban_road_filter_tpu.pipeline import pad_scan

    cfg = FilterConfig()
    n = 131072
    pts = pad_scan(make_scan(SCENES["two_curbs"](), n_rings=64,
                             n_azimuth=2048, seed=0), n)
    b = args.batch
    pts_b = jnp.asarray(np.broadcast_to(pts, (b, n, 4)).copy())

    slope_param = float(np.float32(
        float(np.float32(cfg.curb_slope_deg)) * math.pi / 180.0))

    def sort_stage(p):
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        r = jnp.sqrt(x * x + y * y)
        fi = jnp.arctan2(y, x)
        fi = jnp.where(fi < 0, fi + np.float32(2 * math.pi), fi)
        f = (fi * np.float32(STAR_KFI)).astype(jnp.int32) % STAR_REP
        iota = jnp.arange(n, dtype=jnp.int32)
        return jax.lax.sort((f, r, z, iota), dimension=0, num_keys=2,
                            is_stable=True)

    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    sort_fn = jax.jit(jax.vmap(sort_stage))
    outs = sort_fn(pts_b)
    np.asarray(outs[0][0, :8])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        outs = sort_fn(pts_b)
        np.asarray(outs[0][0, :8])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"sort only      {dt*1e3:8.2f} ms/step  ({dt*1e6/b:7.1f} us/scan)",
          flush=True)
    if args.sort_only:
        return

    for rows in args.rows:
      for bps in args.bps:
        def full(p, rows=rows, bps=bps):
            fk_s, r_s, z_s, pid_s = sort_stage(p)
            return star_scan_pallas(
                fk_s, r_s, z_s, pid_s, slope_param=slope_param,
                kdev=float(cfg.kdev_param), kdist=float(cfg.kdist_param),
                dmin=int(cfg.dmin_param), num_beams=STAR_REP, rows=rows,
                bps=bps)

        fn = jax.jit(jax.vmap(full))
        try:
            hp = fn(pts_b)
            np.asarray(hp[0, :8])
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(f"rows={rows:4d} bps={bps}  FAILED: {str(e)[:120]}",
                  flush=True)
            continue
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            hp = fn(pts_b)
            np.asarray(hp[0, :8])
            ts.append(time.perf_counter() - t0)
        dt = float(np.median(ts))
        print(f"sort+scan r{rows:<4d}bps{bps:<3d}{dt*1e3:8.2f} ms/step  "
              f"({dt*1e6/b:7.1f} us/scan)  hits={int((np.asarray(hp[0])>0).sum())}",
              flush=True)


if __name__ == "__main__":
    main()
