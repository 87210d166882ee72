"""MXU table-gather: per-point lookup from a small (groups, capacity) table.

    out[i] = table[ids[i], pos[i]]   (0 when either index is out of range)

The inverse of ops/place.py: after the pipeline computes labels on the
padded (ring, slot) layout, every point reads its final label back through
its (ring_id, pos) address.  XLA's TPU element-gather is even slower than
its element-scatter (PERF.md dead-ends); here the lookup becomes two exact
one-hot contractions:

    u[i, g] = sum_s [pos_i == s] * table_T[s, g]     (MXU, bf16 operands)
    out[i]  = sum_g [ids_i == g] * u[i, g]           (VPU row reduce)

Table values must be exactly representable in bf16 (pipeline labels are
{0,1,2}); products are one-hot selections, so the contraction is exact at
full MXU rate.  Falls back to a plain fancy-index gather off-TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32
I8 = jnp.int8
BF16 = jnp.bfloat16

_C = 8192  # points per grid step (tools/bench_gather.py TPU sweep, b128:
# 4096 -> 114.5, 8192 -> 37.7 ms/step isolated; 16384 fails to compile —
# the (g_pad, chunk) f32 scratch accumulator leaves VMEM)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _gather_kernel(ids_ref, pos_ref, table_ref, out_ref, acc, *, g_pad: int,
                   pack: int, chunks_per_step: int, i8: bool):
    """chunks_per_step chunks ride one grid step (in-kernel loop, shared
    acc scratch reused serially) — amortizes the fixed per-grid-step cost
    (PERF.md round 4) without growing the (g_pad, chunk) accumulator."""
    for c in range(chunks_per_step):
        _gather_chunk(ids_ref, pos_ref, table_ref, out_ref, acc, c,
                      g_pad=g_pad, pack=pack, i8=i8)


def _gather_chunk(ids_ref, pos_ref, table_ref, out_ref, acc, ci, *,
                  g_pad: int, pack: int, i8: bool):
    # Transpose-free layout: every tensor keeps the POINT axis on lanes.
    # The round-2a version reshaped pos/ids to (C, 1) and row-reduced over
    # lanes — three lane<->sublane relayouts per chunk that dominated the
    # kernel (6.8 ms/step at batch 16).  Here the one-hots put the table
    # axis on sublanes (iota dim 0), the MXU contracts the sublane dims,
    # and the final reduce runs over sublanes (cheap on TPU).
    ids = ids_ref[ci]  # (1, C)
    pos = pos_ref[ci]  # (1, C)
    table_t = table_ref[...]  # (capacity / pack, g_pad) bf16

    c = ids.shape[1]
    cap_p = table_t.shape[0]
    # pack > 1: `pack` consecutive 2-bit values ride one bf16 word, cutting
    # the MXU contraction by the pack factor; the word is unpacked with the
    # point's pos % pack below.
    pos_w = pos // pack if pack > 1 else pos

    # Window the table's slot axis: an input-order chunk advances every
    # ring's slot by only a few positions, so pos_w spans ~1 of the
    # 128-row table panels — the others skip their one-hot AND their MXU
    # contraction entirely.
    inr = pos_w < cap_p
    pmn = jnp.min(jnp.where(inr, pos_w, I32(2 * cap_p)))
    pmx = jnp.max(jnp.where(inr, pos_w, I32(-1)))
    acc[...] = jnp.zeros_like(acc)
    for k in range(0, cap_p, 128):
        kw = min(128, cap_p - k)

        @pl.when((pmx >= k) & (pmn < k + kw))
        def _(k=k, kw=kw):
            sid = k + jax.lax.broadcasted_iota(I32, (kw, c), 0)
            if i8:
                # s8 x s8 -> s32 dot at 2x the bf16 MXU rate.  The table
                # holds word - 128 (s8-exact for packed words 0..255);
                # u[g, i] = T[pos_w_i, g] - 128*[pos_w_i in this window].
                # Unlike place, the offset correction needs no occupancy
                # dot: every in-range point matches exactly one window
                # row, so +128 * [inr & ids-matches-a-row] is applied per
                # POINT after the g-reduce below.
                pos_oh = (sid == pos_w).astype(I32).astype(I8)  # (kw, C)
                acc[...] += jax.lax.dot_general(
                    table_t[k:k + kw], pos_oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=I32)  # (g_pad, C) s32
            else:
                pos_oh = (sid == pos_w).astype(BF16)  # (kw, C)
                # u_t[g, i] = table_t[pos_w_i, g]: contract the slot axes.
                acc[...] += jax.lax.dot_general(
                    table_t[k:k + kw], pos_oh, (((0,), (0,)), ((), ())),
                    preferred_element_type=F32)  # (g_pad, C)

    gid = jax.lax.broadcasted_iota(I32, (g_pad, c), 0)
    if i8:
        ring_oh = (gid == ids).astype(I32)  # (g_pad, C)
        word = jnp.sum(acc[...] * ring_oh, axis=0, keepdims=True)  # (1, C)
        # Undo the -128 table offset once per point: ids always hits a
        # table column when ids < g_pad (zero-fill columns store -128,
        # decoding to word 0), so the correction condition is exactly
        # "some window row matched AND some table column matched".
        word = word + I32(128) * (inr & (ids < I32(g_pad))).astype(I32)
        shift = 2 * (pos % pack)
        out = (jax.lax.shift_right_logical(word, shift) & 3).astype(F32)
    else:
        ring_oh = (gid == ids).astype(F32)  # (g_pad, C)
        out = jnp.sum(acc[...] * ring_oh, axis=0, keepdims=True)  # (1, C)
        if pack > 1:
            word = out.astype(I32)
            shift = 2 * (pos % pack)
            out = (jax.lax.shift_right_logical(word, shift) & 3).astype(F32)
    out_ref[ci] = out.reshape(1, c)


def gather_by_group_pos(table, ids, pos, interpret: bool = False,
                        pack: int = 1, chunk: int = _C,
                        chunks_per_step: int = 2, i8: bool = False,
                        g_mult: int = 128):
    """table: (num_groups, capacity) f32 with bf16-exact values;
    ids/pos: (N,) int32.  Returns (N,) f32; out-of-range -> 0.
    pack=4 requires table values in {0..3}: four 2-bit values are packed
    per bf16 word (still exact: max 255), quartering the MXU work.
    i8: contract in s8 instead of bf16 (2x MXU rate; packed-word values
    0..255 ride as word-128 with a per-point +128 correction — requires
    pack > 1).  g_mult: group-axis pad granule; 128 pads the MXU result
    to full lane width, 8 is the minimal sublane tile (halves the dot,
    the accumulator and the g-reduce for 64-ring rigs)."""
    num_groups, capacity = table.shape
    n = ids.shape[0]

    if jax.default_backend() not in ("tpu", "axon") and not interpret:
        in_range = (ids >= 0) & (ids < num_groups) & (pos >= 0) & (pos < capacity)
        safe = table[jnp.clip(ids, 0, num_groups - 1),
                     jnp.clip(pos, 0, capacity - 1)]
        return jnp.where(in_range, safe, 0).astype(table.dtype)

    g_pad = _round_up(num_groups, g_mult)  # MXU-result pad (see g_mult)
    n_pad = _round_up(n, chunk)
    if pack > 1:
        assert capacity % pack == 0
        t4 = table.astype(I32).reshape(num_groups, capacity // pack, pack)
        weights = (1 << (2 * jnp.arange(pack, dtype=I32)))[None, None, :]
        packed = jnp.sum(t4 * weights, axis=2)  # i32 words <= 255
        if i8:
            # Stored as word - 128 (s8-exact); zero-fill columns hold
            # -128 == word 0, so out-of-table ids decode to 0.
            table_t = jnp.full((capacity // pack, g_pad), -128, I8).at[
                :, :num_groups].set((packed.T - 128).astype(I8))
        else:
            table_t = jnp.zeros((capacity // pack, g_pad), BF16).at[
                :, :num_groups].set(packed.T.astype(F32).astype(BF16))
    else:
        assert not i8, "i8 mode requires packed integer words (pack > 1)"
        table_t = jnp.zeros((capacity, g_pad), BF16).at[:, :num_groups].set(
            table.T.astype(BF16))

    def prep(a, fill):
        return jnp.full((n_pad,), fill, I32).at[:n].set(a).reshape(
            n_pad // chunk, 1, chunk)

    ids2 = prep(ids, I32(g_pad))  # pad rows match no group -> 0
    pos2 = prep(pos, I32(capacity))

    n_chunks = n_pad // chunk
    cs = math.gcd(n_chunks, chunks_per_step)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, g_pad=g_pad, pack=pack,
                          chunks_per_step=cs, i8=i8),
        grid=(n_chunks // cs,),
        in_specs=[
            pl.BlockSpec((cs, 1, chunk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cs, 1, chunk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((capacity // pack, g_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cs, 1, chunk), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 1, chunk), F32),
        scratch_shapes=[pltpu.VMEM((g_pad, chunk), I32 if i8 else F32)],
        interpret=interpret,
    )(ids2, pos2, table_t)
    return out.reshape(-1)[:n].astype(table.dtype)
