"""Micro-benchmark: marker_points_unsorted_pallas rows_per_step sweep on the
real TPU.

Same fixed-per-grid-step story as tools/bench_place.py / bench_gather.py
(PERF.md round 4): at rows_per_step=1 the two marker passes run
R * blocks_per_ring grid steps each per scan; folding k rows into one step
amortizes the fixed step cost (the dominant term for these tiny-compute
blocks).
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
    ap.add_argument("--rows", type=int, nargs="+", default=[1, 4, 8, 16, 32])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from urban_road_filter_tpu.ops.geometry import RingLayout
    from urban_road_filter_tpu.ops.marker_scan import (
        marker_points_unsorted_pallas)

    rings, cap = 64, 2048
    rng = np.random.default_rng(0)

    def f32(a):
        return jnp.asarray(np.broadcast_to(a.astype(np.float32),
                                           (args.batch, rings, cap)).copy())

    alpha = rng.random((rings, cap)).astype(np.float32) * 360.0
    d2 = rng.random((rings, cap)).astype(np.float32) * 40.0
    x = rng.random((rings, cap)).astype(np.float32)
    label = rng.integers(0, 3, (rings, cap)).astype(np.float32)
    counts = np.full((rings,), cap - 37, np.int32)

    b = args.batch
    lay = RingLayout(
        x=f32(x), y=f32(x), z=f32(x), d2=f32(d2), alpha=f32(alpha),
        label=jnp.asarray(np.broadcast_to(label.astype(np.int32),
                                          (b, rings, cap)).copy()),
        pid=jnp.zeros((b, rings, cap), jnp.int32),
        counts=jnp.asarray(np.broadcast_to(counts, (b, rings)).copy()),
        overflow=jnp.zeros((b,), jnp.int32))

    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    want = None
    for k in args.rows:
        fn = jax.jit(jax.vmap(functools.partial(
            marker_points_unsorted_pallas, num_rings=rings, rows_per_step=k)))
        try:
            out = fn(lay)
            got = np.asarray(out[0])
        except Exception as e:  # noqa: BLE001
            print(f"rows={k:3d}  FAILED: {str(e)[:140]}", flush=True)
            continue
        if want is None:
            want = got
        exact = np.array_equal(got, want)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(lay)
            np.asarray(out[0, :2])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"rows={k:3d}  {dt*1e3:8.2f} ms/step  "
              f"({dt*1e6/b:7.1f} us/scan)  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
