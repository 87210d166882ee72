"""Stable group-ranking: position of each element within its group.

`group_positions(ids, num_groups)` returns, for every element, the number
of EARLIER elements with the same group id (its slot in a stable grouped
layout) plus the per-group totals.  This is the core primitive behind
tensorization (points -> (ring, slot)) and star-beam binning.

Implementations:
  * Pallas TPU kernel — points laid out as (rows, 128) lanes; a sequential
    grid walks row-blocks keeping per-group running counts in VMEM scratch
    (TPU grids execute in order).  Within a block the prefix splits into
    a within-row pairwise count (lane x lane compares) plus an across-row
    exclusive prefix of per-row group counts.  Each point is read and
    written exactly once (~1 MB HBM traffic per 131k-point scan) vs
    ~100 GB for a multi-operand bitonic sort of the same data, or an
    11 GB reduce_window temp from XLA's one-hot-cumsum lowering.
  * XLA fallback (sort-based) for CPU tests and non-TPU backends.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32

_LANES = 128
_ROWS = 64  # rows per grid step -> 8192 points; VMEM ~= ROWS*LANES*G*4B
# (tools/bench_rank.py TPU sweep, b128/131k pts/65 groups: 8->56.6,
#  16->56.2, 32->55.8, 64->54.3 ms/step; 128 fails server-side compile.)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _rank_kernel(ids_ref, pos_ref, counts_ref, running, *, g_pad: int,
                 rows: int, blocks_per_step: int):
    """blocks_per_step row-blocks ride one grid step (an in-kernel loop):
    per-block compute (one-hot cube, two prefix matmuls, select) is
    unchanged, but the grid's fixed per-step cost is amortized
    blocks_per_step x (PERF.md round 4)."""
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        running[...] = jnp.zeros_like(running)

    for c in range(blocks_per_step):
        _rank_block(ids_ref, pos_ref, running, c, g_pad=g_pad, rows=rows)

    @pl.when(step == n_steps - 1)
    def _():
        counts_ref[...] = running[...]


def _rank_block(ids_ref, pos_ref, running, c, *, g_pad: int, rows: int):
    ids = ids_ref[c * rows:(c + 1) * rows]  # (rows, LANES) i32, point order

    # MXU-prefix formulation (round-3 variant sweep, tools/
    # bench_rank_variants.py: 51.8 -> 47.7 ms/step at b128): the one-hot
    # is built LANE-TRANSPOSED, O_t[l, r, g] = [ids[r, l] == g], so the
    # within-row exclusive same-group count becomes one strictly-lower-
    # triangular bf16 matmul over the lane axis instead of the
    # (rows, L, L') pairwise compare cube, and its result shares the
    # single one-hot select with the running-base term.  bf16 0/1 operands
    # with f32 accumulation keep every count exact (<= 128 < 2^8).
    ids_t = ids.T  # (LANES, rows) i32
    gids = jax.lax.broadcasted_iota(I32, (1, 1, g_pad), 2)
    oh_t = ids_t[:, :, None] == gids  # (LANES, rows, g_pad) bool
    rowcnt = jnp.sum(oh_t, axis=0, dtype=I32)  # (rows, g_pad)

    # Exclusive across-row prefix of per-row group counts within the block.
    r_i = jax.lax.broadcasted_iota(I32, (rows, rows), 0)
    r_j = jax.lax.broadcasted_iota(I32, (rows, rows), 1)
    lt_r = (r_j < r_i).astype(jnp.float32)  # strictly-lower triangular
    row_base = jnp.dot(lt_r, rowcnt.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
    base = running[0:1, :].astype(jnp.float32) + row_base  # (rows, g_pad)

    # Within-row prefix: P_t[l, r, g] = # lanes l' < l of row r in group g.
    # Stored in bf16 (exact: every prefix count <= 128 < 2^8) — the
    # (L, rows*g_pad) result is this kernel's largest tensor, and bf16
    # halves its write+read traffic.  The MXU accumulator itself must stay
    # 32-bit (Mosaic rejects a bf16 acc: "Expected matmul acc to be
    # 32-bit"); the downcast happens on the store.
    l_i = jax.lax.broadcasted_iota(I32, (_LANES, _LANES), 0)
    l_j = jax.lax.broadcasted_iota(I32, (_LANES, _LANES), 1)
    lt_l = (l_j < l_i).astype(jnp.bfloat16)
    o2 = oh_t.astype(jnp.bfloat16).reshape(_LANES, rows * g_pad)
    p_t = jnp.dot(lt_l, o2, preferred_element_type=jnp.float32).astype(
        jnp.bfloat16).reshape(_LANES, rows, g_pad)

    # ONE one-hot select of (within-row + base); transposed back to the
    # (rows, LANES) output layout.  (Measured dead ends: an i32 pairwise
    # compare cube for within-row cost +4 ms/step; Mosaic's vreg
    # lane-gather (take_along_axis, g_pad == 128 form) for this select
    # REGRESSED 25.3 -> 30.5 ms/step — the per-lane dynamic shuffle
    # lowers to a longer sequence than the where+reduce.)
    tot = p_t.astype(jnp.float32) + base[None, :, :]
    sel = jnp.sum(jnp.where(oh_t, tot, jnp.float32(0)), axis=2)  # (L, rows)
    pos_ref[c * rows:(c + 1) * rows] = sel.astype(I32).T
    running[0:1, :] = running[0:1, :] + jnp.sum(rowcnt, axis=0, keepdims=True)


def _pallas_rank(ids: jax.Array, num_groups: int, interpret: bool = False,
                 rows: int = _ROWS, blocks_per_step: int = 2):
    n = ids.shape[0]
    g_pad = _round_up(num_groups + 1, _LANES)  # last group = padding sink
    n_pad = _round_up(n, rows * _LANES)
    n_blocks = n_pad // (rows * _LANES)
    bs = math.gcd(n_blocks, blocks_per_step)
    ids2 = jnp.full((n_pad,), g_pad - 1, I32).at[:n].set(ids)
    ids2 = ids2.reshape(n_pad // _LANES, _LANES)

    pos, counts = pl.pallas_call(
        functools.partial(_rank_kernel, g_pad=g_pad, rows=rows,
                          blocks_per_step=bs),
        grid=(n_blocks // bs,),
        in_specs=[pl.BlockSpec((bs * rows, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bs * rows, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, g_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad // _LANES, _LANES), I32),
                   jax.ShapeDtypeStruct((8, g_pad), I32)),
        scratch_shapes=[pltpu.VMEM((8, g_pad), I32)],
        interpret=interpret,
    )(ids2)
    return pos.reshape(-1)[:n], counts[0, :num_groups]


def _xla_rank(ids: jax.Array, num_groups: int):
    """Sort-based fallback: stable sort by id, position = index - group
    start."""
    n = ids.shape[0]
    iota = jnp.arange(n, dtype=I32)
    key = ids * I32(n) + iota
    key_s, idx_s = jax.lax.sort((key, iota), num_keys=1)
    ids_s = key_s // I32(n)
    counts = jnp.sum(ids[:, None] == jnp.arange(num_groups, dtype=I32)[None, :],
                     axis=0, dtype=I32)
    starts = jnp.concatenate([jnp.zeros((1,), I32),
                              jnp.cumsum(counts)[:-1].astype(I32)])
    pos_s = iota - starts[jnp.clip(ids_s, 0, num_groups - 1)]
    pos = jnp.zeros((n,), I32).at[idx_s].set(pos_s)
    return pos, counts


def group_positions(ids: jax.Array, num_groups: int):
    """(pos, counts): pos[i] = # of j < i with ids[j] == ids[i];
    counts[g] = total elements of group g.  ids must be in [0, num_groups)."""
    if jax.default_backend() in ("tpu", "axon"):
        return _pallas_rank(ids, num_groups)
    return _xla_rank(ids, num_groups)
