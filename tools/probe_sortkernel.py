"""Probe: per-stage cost of an in-VMEM bitonic compare-exchange on TPU.

Decides VERDICT r3 item 1 (Pallas VMEM sort replacing the star
(beam, radius) `lax.sort`, the largest device cost at ~30 ms/step) with
data before building the full network.  A full bitonic sort of n = 2^17
needs 153 compare-exchange stages: 98 lane-XOR stages (j < 128) and 55
sublane-XOR stages (j >= 128, row stride j/128).  Each stage, on packed
2-word keys + z payload (3 live streams, see ops/star._star_sort), costs
~20 vector ops on a (1024, 128) block via the two-roll XOR-partner trick:

    partner = where(bit_j_clear, roll(x, -s, axis), roll(x, +s, axis))

This probe runs ITERS identical stages of each flavor inside one
pallas_call (fori_loop, VMEM-resident), so

    ms_per_stage ~= (t_iters - t_0) / ITERS

isolates the steady-state stage cost from the kernel's fixed overhead
(HBM in/out + dispatch).  Break-even: 153 stages must come in under the
in-pipeline sort fusion (~234 us/scan at b128) to justify the build.

Usage: python tools/probe_sortkernel.py [--batch 128] [--iters-probe 64]
Run alone (never overlap TPU jobs).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 1024  # n = ROWS * 128 = 131072
LANES = 128


def _stage_body(hi, lo, z, *, axis, s, jbit, kbit, idx):
    """One bitonic compare-exchange stage on the 3 packed streams."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    low = (idx & jbit) == 0
    up = (idx & kbit) == 0
    want_min = low == up

    size = ROWS if axis == 0 else LANES

    def partner(v):
        # pltpu.roll requires non-negative shifts: -s == size - s (mod size)
        return jnp.where(low, pltpu.roll(v, size - s, axis=axis),
                         pltpu.roll(v, s, axis=axis))

    ph, pl_, pz = partner(hi), partner(lo), partner(z)
    less = (ph < hi) | ((ph == hi) & (pl_ < lo))  # partner < self
    # NOT jnp.where(want_min, less, ~less): an i1-select lowers to an
    # unsupported i8->i1 trunci in Mosaic; bool == bool is XNOR, legal.
    take = less == want_min
    return (jnp.where(take, ph, hi), jnp.where(take, pl_, lo),
            jnp.where(take, pz, z))


def make_probe(axis: int, s: int, iters: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jbit = s * LANES if axis == 0 else s
    kbit = jbit * 2  # representative level bit

    def kernel(hi_ref, lo_ref, z_ref, out_ref):
        row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
        idx = row * LANES + lane

        def body(_, carry):
            return _stage_body(*carry, axis=axis, s=s, jbit=jbit,
                               kbit=kbit, idx=idx)

        hi, lo, z = jax.lax.fori_loop(
            0, iters, body, (hi_ref[:], lo_ref[:], z_ref[:]))
        out_ref[:] = hi + lo + z

    @jax.jit
    def run(hi, lo, z):
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((ROWS, LANES), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        return jax.vmap(f)(hi, lo, z)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters-probe", type=int, default=64)
    ap.add_argument("--timing-iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b = args.batch
    hi = jnp.asarray(rng.integers(0, 1 << 30, (b, ROWS, LANES)), jnp.int32)
    lo = jnp.asarray(rng.integers(0, 1 << 26, (b, ROWS, LANES)), jnp.int32)
    z = jnp.asarray(rng.integers(-(1 << 30), 1 << 30, (b, ROWS, LANES)),
                    jnp.int32)
    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    flavors = [
        ("lane s=16      ", 1, 16),
        ("lane s=1       ", 1, 1),
        ("sublane s=1row ", 0, 1),
        ("sublane s=64row", 0, 64),
    ]
    print(f"batch {b}, block ({ROWS},{LANES}), probe iters "
          f"{args.iters_probe}", flush=True)
    for name, axis, s in flavors:
        per_iter = {}
        for iters in (1, args.iters_probe):
            try:
                run = make_probe(axis, s, iters)
                out = run(hi, lo, z)
                np.asarray(out[0, :1, :8])
            except Exception as e:  # noqa: BLE001
                print(f"{name} iters={iters} FAILED: {str(e)[:160]}",
                      flush=True)
                per_iter = None
                break
            t0 = time.perf_counter()
            for _ in range(args.timing_iters):
                out = run(hi, lo, z)
                np.asarray(out[0, :1, :8])
            per_iter[iters] = (time.perf_counter() - t0) / args.timing_iters
        if per_iter is None:
            continue
        dt = per_iter[args.iters_probe] - per_iter[1]
        per_stage_us = dt * 1e6 / (args.iters_probe - 1) / b
        full_net_us = per_stage_us * 153
        print(f"{name} step1 {per_iter[1]*1e3:7.2f} ms  "
              f"step{args.iters_probe} {per_iter[args.iters_probe]*1e3:7.2f} ms"
              f"  -> {per_stage_us:6.3f} us/stage/scan"
              f"  (153-stage net ~{full_net_us:6.1f} us/scan)", flush=True)


if __name__ == "__main__":
    main()
