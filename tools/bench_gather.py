"""Micro-benchmark: gather_by_group_pos chunk-size sweep on the real TPU.

Same fixed-per-grid-step story as tools/bench_place.py (PERF.md round-4
item 1): at _C=4096 the label gather runs 32 steps x batch; larger chunks
amortize the step cost against a bigger scratch accumulator.
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
                    default=[4096, 8192, 16384])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--i8", action="store_true",
                    help="s8-MXU contraction (round 5)")
    ap.add_argument("--g-mult", type=int, default=128,
                    help="group-axis pad granule (128=full lane, 8=min)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from urban_road_filter_tpu.ops.gather import gather_by_group_pos

    n, rings, cap = 131072, 64, 2048
    rng = np.random.default_rng(0)
    ids = np.tile(np.arange(rings, dtype=np.int32), n // rings)
    ids[rng.random(n) < 0.08] = rings
    pos = np.zeros(n, np.int32)
    heads = np.zeros(rings + 1, np.int64)
    for i in range(n):
        pos[i] = heads[ids[i]]
        heads[ids[i]] += 1
    table = rng.integers(0, 3, (rings, cap)).astype(np.float32)

    b = args.batch
    ids_b = jnp.asarray(np.broadcast_to(ids, (b, n)).copy())
    pos_b = jnp.asarray(np.broadcast_to(pos, (b, n)).copy())
    tab_b = jnp.asarray(np.broadcast_to(table, (b, rings, cap)).copy())

    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    want = None
    for chunk in args.chunks:
        fn = jax.jit(jax.vmap(functools.partial(
            gather_by_group_pos, pack=4, chunk=chunk, i8=args.i8,
            g_mult=args.g_mult)))
        try:
            out = fn(tab_b, ids_b, pos_b)
            got = np.asarray(out[0])
        except Exception as e:  # noqa: BLE001
            print(f"chunk={chunk:6d}  FAILED: {str(e)[:120]}", flush=True)
            continue
        if want is None:
            want = got
        exact = np.array_equal(got, want)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(tab_b, ids_b, pos_b)
            np.asarray(out[0, :8])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"chunk={chunk:6d}  {dt*1e3:8.2f} ms/step  "
              f"({dt*1e6/b:7.1f} us/scan)  exact={exact}", flush=True)


if __name__ == "__main__":
    main()
