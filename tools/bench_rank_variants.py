"""Rank-kernel restructure probes (PERF.md round-4 roadmap item 2).

Variants (kernels local to this tool; the library keeps ops/rank.py):
  full        — the shipping kernel (import), _ROWS=64.
  no-pairwise — within-row count zeroed (WRONG results; times the rest of
                the kernel to attribute cost to the (rows, L, L) cube).
  no-select   — one-hot base select zeroed (WRONG; attributes the
                (rows, L, G) select cube).
  mxu         — within-row count via a strictly-lower-triangular bf16
                matmul on a lane-transposed one-hot (exact: 0/1 values,
                f32 accumulation), folded into the base select.

Run each variant in its OWN process (a failed Mosaic compile poisons the
axon server: CLAUDE.md): `for v in full mxu; do python tools/bench_rank_variants.py --variant $v; done`
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LANES = 128
_ROWS = 64


def _round_up(v, m):
    return (v + m - 1) // m * m


def make_variant_kernel(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    I32 = jnp.int32

    def kernel(ids_ref, pos_ref, counts_ref, running, *, g_pad, rows):
        step = pl.program_id(0)
        n_steps = pl.num_programs(0)

        @pl.when(step == 0)
        def _():
            running[...] = jnp.zeros_like(running)

        ids = ids_ref[...]
        gids = jax.lax.broadcasted_iota(I32, (1, 1, g_pad), 2)

        if variant == "mxu":
            # Lane-transposed one-hot: O_t[l, r, g] = (ids[r, l] == g).
            ids_t = ids.T  # (LANES, rows) i32
            oh_t = ids_t[:, :, None] == gids  # (L, rows, g_pad) bool
            rowcnt = jnp.sum(oh_t, axis=0, dtype=I32)  # (rows, g_pad)
            r_i = jax.lax.broadcasted_iota(I32, (rows, rows), 0)
            r_j = jax.lax.broadcasted_iota(I32, (rows, rows), 1)
            lt_r = (r_j < r_i).astype(jnp.float32)
            row_base = jnp.dot(lt_r, rowcnt.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
            base = running[0:1, :].astype(jnp.float32) + row_base

            l_i = jax.lax.broadcasted_iota(I32, (_LANES, _LANES), 0)
            l_j = jax.lax.broadcasted_iota(I32, (_LANES, _LANES), 1)
            lt_l = (l_j < l_i).astype(jnp.bfloat16)  # strictly lower
            o2 = oh_t.astype(jnp.bfloat16).reshape(_LANES, rows * g_pad)
            p2 = jnp.dot(lt_l, o2, preferred_element_type=jnp.float32)
            p_t = p2.reshape(_LANES, rows, g_pad)
            tot = p_t + base[None, :, :]  # (L, rows, g_pad) f32
            sel = jnp.sum(jnp.where(oh_t, tot, jnp.float32(0)), axis=2)
            pos_ref[...] = sel.astype(I32).T
            running[0:1, :] = running[0:1, :] + jnp.sum(rowcnt, axis=0,
                                                        keepdims=True)
        else:
            lane = jax.lax.broadcasted_iota(I32, (1, _LANES, _LANES), 1)
            lane_p = jax.lax.broadcasted_iota(I32, (1, _LANES, _LANES), 2)
            if variant == "no-pairwise":
                within_row = jnp.zeros((rows, _LANES), I32)
            else:
                same_lt = (ids[:, :, None] == ids[:, None, :]) & (lane_p < lane)
                within_row = jnp.sum(same_lt, axis=2, dtype=I32)
            oh3 = ids[:, :, None] == gids
            rowcnt = jnp.sum(oh3, axis=1, dtype=I32)
            r_i = jax.lax.broadcasted_iota(I32, (rows, rows), 0)
            r_j = jax.lax.broadcasted_iota(I32, (rows, rows), 1)
            lt = (r_j < r_i).astype(jnp.float32)
            row_base = jnp.dot(lt, rowcnt.astype(jnp.float32),
                               preferred_element_type=jnp.float32).astype(I32)
            base = running[0:1, :] + row_base
            if variant == "no-select":
                base_sel = jnp.zeros((rows, _LANES), I32)
            else:
                base_sel = jnp.sum(jnp.where(oh3, base[:, None, :], I32(0)),
                                   axis=2)
            pos_ref[...] = within_row + base_sel
            running[0:1, :] = running[0:1, :] + jnp.sum(rowcnt, axis=0,
                                                        keepdims=True)

        @pl.when(step == n_steps - 1)
        def _():
            counts_ref[...] = running[...]

    def rank(ids, num_groups, interpret=False):
        n = ids.shape[0]
        g_pad = _round_up(num_groups + 1, _LANES)
        n_pad = _round_up(n, _ROWS * _LANES)
        ids2 = jnp.full((n_pad,), g_pad - 1, I32).at[:n].set(ids)
        ids2 = ids2.reshape(n_pad // _LANES, _LANES)
        pos, counts = pl.pallas_call(
            functools.partial(kernel, g_pad=g_pad, rows=_ROWS),
            grid=(n_pad // (_ROWS * _LANES),),
            in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((8, g_pad), lambda i: (0, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), I32),
                       jax.ShapeDtypeStruct((8, g_pad), I32)),
            scratch_shapes=[pltpu.VMEM((8, g_pad), I32)],
            interpret=interpret,
        )(ids2)
        return pos.reshape(-1)[:n], counts[0, :num_groups]

    return rank


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="full",
                    choices=["full", "no-pairwise", "no-select", "mxu"])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--interpret-check", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp  # noqa: F401

    n, groups = 131072, 65
    rng = np.random.default_rng(0)
    ids = np.tile(np.arange(64, dtype=np.int32), n // 64 + 1)[:n]
    ids[rng.random(n) < 0.08] = 64

    if args.interpret_check:
        jax.config.update("jax_platforms", "cpu")
        from urban_road_filter_tpu.ops.rank import _xla_rank

        rank = make_variant_kernel(args.variant)
        pos, counts = jax.jit(functools.partial(
            rank, num_groups=groups, interpret=True))(jnp.asarray(ids[:16384]))
        wpos, wcounts = jax.jit(functools.partial(
            _xla_rank, num_groups=groups))(jnp.asarray(ids[:16384]))
        ok = (np.array_equal(np.asarray(pos), np.asarray(wpos)) and
              np.array_equal(np.asarray(counts), np.asarray(wcounts)))
        print(f"{args.variant}: interpret parity {'OK' if ok else 'MISMATCH'}")
        return

    if args.variant == "full":
        from urban_road_filter_tpu.ops.rank import _pallas_rank as rank
    else:
        rank = make_variant_kernel(args.variant)

    ids_b = jnp.asarray(np.broadcast_to(ids, (args.batch, n)).copy())
    np.asarray(jnp.zeros((8,), jnp.int32))  # tunnel warm-up

    fn = jax.jit(jax.vmap(functools.partial(rank, num_groups=groups)))
    pos, counts = fn(ids_b)
    np.asarray(pos[0, :8])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        pos, _ = fn(ids_b)
        np.asarray(pos[0, :8])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"{args.variant:12s}  {dt*1e3:8.2f} ms/step  "
          f"({dt*1e6/args.batch:7.1f} us/scan)", flush=True)


if __name__ == "__main__":
    main()
