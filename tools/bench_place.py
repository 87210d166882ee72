"""Micro-benchmark: group_place_pallas chunk-size sweep on the real TPU.

PERF.md round-4 roadmap item 1 (place = 35.4 ms/step at b128): the grid
runs n_chunks x batch steps, and Pallas charges a fixed per-step cost
(block DMA issue + bookkeeping) even when the body is skipped — at
chunk=1024 that is 16,384 steps per batch.  Bigger chunks trade per-step
overhead for a larger A-tile build; this sweep measures the trade.

Usage: python tools/bench_place.py [--chunks 1024 2048 4096] [--batch 128]
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
    ap.add_argument("--chunks", type=int, nargs="+",
                    default=[1024, 2048, 4096])
    ap.add_argument("--cps", type=int, nargs="+", default=[1],
                    help="chunks_per_step values to sweep")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--byte-limbs", action="store_true",
                    help="use the s8-MXU byte-limb kernel")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from urban_road_filter_tpu.ops.place import group_place_pallas

    n, rings, cap = 131072, 64, 2048
    rng = np.random.default_rng(0)
    # Firing-order stream: ring cycles fast, slots advance slowly (the
    # column-panel-skipping assumption group_place_pallas is tuned for).
    ids = np.tile(np.arange(rings, dtype=np.int32), n // rings)
    drop = rng.random(n) < 0.08
    ids[drop] = rings  # dropped points -> sink group
    pos = np.zeros(n, np.int32)
    heads = np.zeros(rings + 1, np.int64)
    for i in range(n):  # stable per-ring slot numbering
        pos[i] = heads[ids[i]]
        heads[ids[i]] += 1
    x = rng.standard_normal(n).astype(np.float32) * 10
    y = rng.standard_normal(n).astype(np.float32) * 10
    z = rng.standard_normal(n).astype(np.float32)

    b = args.batch
    ids_b = jnp.asarray(np.broadcast_to(ids, (b, n)).copy())
    pos_b = jnp.asarray(np.broadcast_to(pos, (b, n)).copy())
    f_b = [jnp.asarray(np.broadcast_to(v, (b, n)).copy()) for v in (x, y, z)]

    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    want = None
    for chunk in args.chunks:
        for cps in args.cps:
            fn = jax.jit(jax.vmap(
                lambda i_, p_, x_, y_, z_, chunk=chunk, cps=cps:
                group_place_pallas(
                    i_, p_, [x_, y_, z_], rings, cap, limb_counts=(3, 3, 3),
                    chunk=chunk, chunks_per_step=cps,
                    byte_limbs=args.byte_limbs)))
            try:
                outs = fn(ids_b, pos_b, *f_b)
                got = np.asarray(outs[0][0])
            except Exception as e:  # noqa: BLE001 — report, continue sweep
                print(f"chunk={chunk:5d} cps={cps:2d}  FAILED: "
                      f"{str(e)[:120]}", flush=True)
                continue
            if want is None:
                want = got
            exact = np.array_equal(got, want)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                outs = fn(ids_b, pos_b, *f_b)
                np.asarray(outs[0][0, :1])
            dt = (time.perf_counter() - t0) / args.iters
            print(f"chunk={chunk:5d} cps={cps:2d}  {dt*1e3:8.2f} ms/step  "
                  f"({dt*1e6/b:7.1f} us/scan)  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
