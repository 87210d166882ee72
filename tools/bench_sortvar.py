"""Star-sort variant sweep on the real TPU: can the 2-key stable 4-operand
sort (f, r | z, pid) be reformulated cheaper with IDENTICAL ordering?

Variants (all produce bit-identical (fk_s, r_s, z_s, pid_s) streams):
  v0  baseline: sort((f, r, z, iota), num_keys=2, is_stable=True)
  v1  explicit tiebreak: sort((f, r, iota, z), num_keys=3, is_stable=False)
      — iota is unique, so a 3rd key reproduces stability; hypothesis: the
      stable flag makes XLA append a hidden iota operand, so v1 saves one.
  v2  all-i32 keys: r >= 0 bitcast to i32 is order-isomorphic (sign bit 0,
      +inf = 0x7f800000 sorts last); keys (f, rb, iota), payload z.
  v3  packed 2-word keys (round 4 — ops/star.py _star_sort(packed=True)):
      one word cannot hold rb+iota (31+17 bits), but TWO can hold all
      three of (f, rb, iota): hi = f<<22 | rb>>9 (31 bits),
      lo = (rb & 0x1ff)<<17 | iota (26 bits) — a 3-operand sort carrying
      the z payload.  MEASURED SLOWER (580.9 vs v0's 507.2 us/scan):
      operand count is not the cost driver, and the pack/unpack passes
      don't fuse into the sort.  Production stays on v0.

Usage: python tools/bench_sortvar.py [--batch 128] [--iters 10]
Run alone (never overlap TPU jobs), from /root/repo with inherited env.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from urban_road_filter_tpu.constants import STAR_KFI, STAR_REP
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
    from urban_road_filter_tpu.pipeline import pad_scan

    n = 131072
    pts = pad_scan(make_scan(SCENES["two_curbs"](), n_rings=64,
                             n_azimuth=2048, seed=0), n)
    b = args.batch
    pts_b = jnp.asarray(np.broadcast_to(pts, (b, n, 4)).copy())

    def keys(p):
        # Keep-gating (star.py's STAR_REP sink segment + r_key=inf for
        # dropped points) is omitted: operand count and dtypes match the
        # production sort, so the cost-equality conclusion is unaffected.
        x, y, z = p[:, 0], p[:, 1], p[:, 2]
        r = jnp.sqrt(x * x + y * y)
        fi = jnp.arctan2(y, x)
        fi = jnp.where(fi < 0, fi + np.float32(2 * math.pi), fi)
        f = (fi * np.float32(STAR_KFI)).astype(jnp.int32) % STAR_REP
        iota = jnp.arange(n, dtype=jnp.int32)
        return f, r, z, iota

    def v0(p):
        f, r, z, iota = keys(p)
        return jax.lax.sort((f, r, z, iota), dimension=0, num_keys=2,
                            is_stable=True)

    def v1(p):
        f, r, z, iota = keys(p)
        fs, rs, ps, zs = jax.lax.sort((f, r, iota, z), dimension=0,
                                      num_keys=3, is_stable=False)
        return fs, rs, zs, ps

    def v2(p):
        f, r, z, iota = keys(p)
        rb = jax.lax.bitcast_convert_type(r, jnp.int32)
        fs, rbs, ps, zs = jax.lax.sort((f, rb, iota, z), dimension=0,
                                       num_keys=3, is_stable=False)
        return fs, jax.lax.bitcast_convert_type(rbs, jnp.float32), zs, ps

    def v3(p):
        from urban_road_filter_tpu.ops.star import _star_sort

        f, r, z, iota = keys(p)
        return _star_sort(f, r, z, iota, n, packed=True)

    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    ref = None
    for name, fn in (("v0 2key-stable ", v0), ("v1 3key        ", v1),
                     ("v2 3key-i32    ", v2), ("v3 packed-2word", v3)):
        jf = jax.jit(jax.vmap(fn))
        try:
            outs = jf(pts_b)
            np.asarray(outs[0][0, :8])
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {str(e)[:140]}", flush=True)
            continue
        got = tuple(np.asarray(o[0]) for o in outs)
        if ref is None:
            ref = got
            eq = "ref"
        else:
            eq = "EXACT" if all(
                np.array_equal(a, b_, equal_nan=True)
                for a, b_ in zip(ref, got)) else "MISMATCH"
        t0 = time.perf_counter()
        for _ in range(args.iters):
            outs = jf(pts_b)
            np.asarray(outs[0][0, :8])
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name} {dt*1e3:8.2f} ms/step ({dt*1e6/b:7.1f} us/scan)  {eq}",
              flush=True)


if __name__ == "__main__":
    main()
