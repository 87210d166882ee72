"""Micro-benchmark: _pallas_rank _ROWS sweep on the real TPU.

Usage: python tools/bench_rank.py [--rows 8 16 32 64] [--batch 128]

PERF.md round-4 roadmap item 2: the _ROWS block height was tuned at 32 in
round 1 and never re-measured after the round-2 block tunings.  Timings are
fetch-synced (CLAUDE.md: block_until_ready does not drain on this backend)
and amortized over iters at full batch so the 25-30 ms per-call dispatch
overhead stays ~0.2 ms/scan.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, nargs="+", default=[8, 16, 32, 64, 128])
    ap.add_argument("--bps", type=int, nargs="+", default=[1],
                    help="blocks_per_step values to sweep")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from urban_road_filter_tpu.ops.rank import _pallas_rank

    n, groups = 131072, 65
    rng = np.random.default_rng(0)
    # Realistic id stream: azimuth-major firing order (ring cycles fast),
    # with ~8% dropped points (group 64 = the padding sink the pipeline uses).
    ids = np.tile(np.arange(64, dtype=np.int32), n // 64 + 1)[:n]
    ids[rng.random(n) < 0.08] = 64
    ids_b = jnp.asarray(np.broadcast_to(ids, (args.batch, n)).copy())

    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    for rows in args.rows:
        for bps in args.bps:
            fn = jax.jit(jax.vmap(functools.partial(
                _pallas_rank, num_groups=groups, rows=rows,
                blocks_per_step=bps)))
            try:
                pos, counts = fn(ids_b)
                np.asarray(pos[0, :8])
            except Exception as e:  # noqa: BLE001 — report, continue sweep
                print(f"rows={rows:4d} bps={bps:2d}  FAILED: "
                      f"{str(e)[:120]}", flush=True)
                continue
            t0 = time.perf_counter()
            for _ in range(args.iters):
                pos, _ = fn(ids_b)
                np.asarray(pos[0, :8])
            dt = (time.perf_counter() - t0) / args.iters
            print(f"rows={rows:4d} bps={bps:2d}  {dt*1e3:8.2f} ms/step  "
                  f"({dt*1e6/args.batch:7.1f} us/scan)", flush=True)


if __name__ == "__main__":
    main()
