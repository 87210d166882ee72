"""Pallas TPU kernel for the star-shaped walk over the beam-sorted stream.

Computes, in ONE sequential pass over the (beam, radius)-sorted point
stream, everything ops/star.py needs after its sort: the consecutive-point
slopes, the segment-reset flags, the per-segment running statistics (m,
sum of slopes, sum of absolute deviations), the walk index, the trigger
predicate, the FIRST trigger per segment, and the per-beam hit
accumulation — returning just the (g_pad,) hit table.

The XLA fallback in ops/star.py expresses the same recurrences as
`lax.associative_scan`s; on TPU those lower to log-depth slice/pad chains
measured at ~0.8 ms/scan.  This kernel streams each element exactly once:

  * the previous-element values (for dr/dz slopes and the segment-reset
    flags) come from one lane roll + a tiny (_ROWS, _ROWS) row shift, with
    the block's last element carried in VMEM scratch — so the kernel needs
    only the 4 sorted streams (fk, r, z, pid) instead of 7 host-prepped
    ones (round-4: the XLA-side rolls/div/isnan/where prep was ~10 full-
    array HBM passes);
  * within a 128-lane row, segmented prefix sums are masked log-depth
    roll-adds;
  * across the _ROWS rows of a block, a tiny (_ROWS, _ROWS) row-level pass;
  * across blocks, carries live in VMEM scratch (TPU grids run in order,
    same trick as ops/rank.py).

Because the stream is segment-sorted, the carry out of a block is simply
the inclusive prefix at its last element.  All float arithmetic matches
the fallback (f32 sub/div for the slopes, f32 adds in the same order:
lane-major then row-major).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

_LANES = 128
_ROWS = 32  # 4096 points per grid step (tools/bench_star.py TPU sweep on
# the stream-input kernel: r32 94.02, r64 94.85 ms/step sort+scan at b128;
# the (_ROWS, _ROWS) row-carry matrices stay tiny)
_BPS = 1  # (rows, 128) blocks folded per grid step.  Swept on TPU r5
# (tools/bench_star.py --bps 1 2 4 8 at rows=32, b128): 94.40 / 93.77 /
# 97.15 / 96.11 ms/step sort+scan — NEUTRAL within tunnel spread; the
# per-grid-step fixed cost is already amortized at 4096-pt blocks, so
# production stays at 1 (the fold remains available and bit-exact,
# pinned by tests/test_pallas_interpret.py).


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _star_scan_kernel(params_ref, fk_ref, r_ref, z_ref, pid_ref, hp_ref,
                      carry, hp_acc, *, g_pad: int, num_beams: int,
                      rows: int, bps: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        # fk carry = -1: no real beam index, so the stream's very first
        # element always opens a segment (the fallback's first[0] = True).
        carry[5:6, :] = jnp.full((1, _LANES), -1.0, F32)
        hp_acc[...] = jnp.zeros_like(hp_acc)

    # blocks-per-step fold (round 5): process `bps` (rows, 128) sub-blocks
    # per grid step, carrying the 8 carry rows as VALUES between them —
    # same per-block op order (bit-exact), 1/bps the grid steps, and the
    # inter-block carry round-trips through registers instead of scratch.
    carry_v = carry[...]
    for j in range(bps):
        carry_v = _star_block(
            params_ref, fk_ref[j * rows:(j + 1) * rows, :],
            r_ref[j * rows:(j + 1) * rows, :],
            z_ref[j * rows:(j + 1) * rows, :],
            pid_ref[j * rows:(j + 1) * rows, :],
            carry_v, hp_acc, g_pad=g_pad, num_beams=num_beams, rows=rows)
    carry[...] = carry_v

    @pl.when(step == n_steps - 1)
    def _():
        hp_ref[...] = hp_acc[...]


def _star_block(params_ref, fk, r, zz, pid, carry_v, hp_acc, *, g_pad: int,
                num_beams: int, rows: int):
    """One (rows, 128) block of the walk; takes and returns the (8, 128)
    carry as a VALUE."""
    lane2 = jax.lax.broadcasted_iota(I32, (rows, _LANES), 1)
    ki = jax.lax.broadcasted_iota(I32, (rows, rows), 0)
    kj = jax.lax.broadcasted_iota(I32, (rows, rows), 1)
    row1 = jax.lax.broadcasted_iota(I32, (rows, 1), 0)

    # --- previous element in row-major point order -----------------------
    # One circular lane roll gives every lane>0 its predecessor and lane 0
    # the SAME row's lane 127; the (rows, rows) select shifts that column
    # down one row, and the block carry patches row 0.
    def prev(v, carry_row):
        rolled = pltpu.roll(v, 1, axis=1)
        col = rolled[:, 0:1]  # (R, 1) = v[:, 127]
        col_j = jnp.broadcast_to(col.reshape(1, rows), (rows, rows))
        sel = jnp.sum(jnp.where(kj == ki - 1, col_j, F32(0)), axis=1,
                      keepdims=True)  # (R, 1): v[k-1, 127]; 0 at row 0
        sel = jnp.where(row1 == 0, carry_row[0:1, 0:1], sel)
        out = jnp.where(lane2 == 0, sel, rolled)
        new_carry = jnp.broadcast_to(v[rows - 1:rows, _LANES - 1:_LANES],
                                     (1, _LANES))
        return out, new_carry

    fk_f = fk.astype(F32)  # beam ids <= g_pad < 2^24: exact in f32
    fkp, c_fk = prev(fk_f, carry_v[5:6, :])
    rp, c_r = prev(r, carry_v[6:7, :])
    zp, c_z = prev(zz, carry_v[7:8, :])

    first = fkp != fk_f
    first_i = first.astype(I32)
    wk = (fk < num_beams) & ~first
    dr = r - rp
    slp = (zz - zp) / dr  # garbage at segment starts/padding: wk-masked
    vstat = wk & ~jnp.isnan(slp)  # NaN slopes skip the stats update

    # --- within-row segmented scans: log-depth Hillis-Steele over lanes ---
    # The absorb masks depend only on the (shared) reset flags, so the
    # flag-propagation rolls run ONCE and the masks are reused by all
    # three scan invocations (they were ~25% of this kernel's lane rolls).
    absorbs = []
    flag = first_i
    for d in (1, 2, 4, 8, 16, 32, 64):
        okl = lane2 >= d
        absorbs.append(okl & (flag == 0))  # don't pull across a seg start
        flag = jnp.where(okl, flag | pltpu.roll(flag, d, axis=1), flag)
    row_open_all = flag == 0

    def seg_scan_rows(values):
        """Inclusive segmented prefix sums of several (rows, 128) f32 arrays
        (shared reset flags `first_i`), within each row.  7 masked
        roll-add rounds instead of a lane-triangular reduce.  Returns the
        scanned values plus `row_open` (no reset at or before each lane)."""
        vs = list(values)
        for absorb, d in zip(absorbs, (1, 2, 4, 8, 16, 32, 64)):
            for i, v in enumerate(vs):
                vs[i] = jnp.where(absorb, v + pltpu.roll(v, d, axis=1), v)
        return vs, row_open_all

    # --- row-level carry machinery (shared by every scanned value) ---
    has_reset = jnp.max(first_i, axis=1, keepdims=True)  # (rows, 1) i32
    hr_j = jnp.broadcast_to(has_reset.reshape(1, rows), (rows, rows))
    lrr = jnp.max(jnp.where((hr_j != 0) & (kj < ki), kj, -1), axis=1,
                  keepdims=True)  # (rows, 1): last reset row before k
    carry_sel = (kj < ki) & (kj >= lrr)
    no_reset_before = (lrr == -1)  # (rows, 1)

    def add_carries(rs, row_open, carry_row):
        """Add row- and block-level carries to a row-scanned value."""
        rowtot = rs[:, _LANES - 1:_LANES]  # (rows, 1) value at lane 127
        rt_j = jnp.broadcast_to(rowtot.reshape(1, rows), (rows, rows))
        carry_in = jnp.sum(jnp.where(carry_sel, rt_j, F32(0)), axis=1,
                           keepdims=True)  # (rows, 1)
        block_carry = carry_row[0:1, 0:1]  # (1, 1), all lanes equal
        carry_in = carry_in + jnp.where(no_reset_before, block_carry, F32(0))
        out = rs + jnp.where(row_open, carry_in, F32(0))
        new_carry = jnp.broadcast_to(out[rows - 1:rows, _LANES - 1:_LANES],
                                     (1, _LANES))
        return out, new_carry

    ones = jnp.ones_like(slp)
    (rs_rank, rs_m, rs_slp), row_open = seg_scan_rows(
        (ones, jnp.where(vstat, F32(1), F32(0)),
         jnp.where(vstat, slp, F32(0))))
    rank, c_rank = add_carries(rs_rank, row_open, carry_v[3:4, :])
    m, c_m = add_carries(rs_m, row_open, carry_v[0:1, :])
    sum_slp, c_slp = add_carries(rs_slp, row_open, carry_v[1:2, :])
    avg = jnp.where(m > 0, sum_slp / m, F32(0))

    (rs_dev,), _ = seg_scan_rows((jnp.where(vstat, jnp.abs(slp - avg),
                                            F32(0)),))
    sum_dev, c_dev = add_carries(rs_dev, row_open, carry_v[2:3, :])
    dev = jnp.where(m > 0, sum_dev / m, F32(0))

    # Threshold params ride SMEM so config hot-swap needs no re-trace:
    # [slope_param, kdev, kdist, dmin] (dmin exact in f32, <= 30).
    slope_param = params_ref[0, 0]
    kdev = params_ref[0, 1]
    kdist = params_ref[0, 2]
    dmin = params_ref[0, 3]
    i_idx = rank - 1
    adaptive = (i_idx > dmin) & (
        (slp * slp - avg * avg) * kdev * (dr * kdist) > dev)
    trigger = wk & ((slp > slope_param) | adaptive)

    (rs_trig,), _ = seg_scan_rows((jnp.where(trigger, F32(1), F32(0)),))
    cum_trig, c_trig = add_carries(rs_trig, row_open, carry_v[4:5, :])
    first_trig = trigger & (cum_trig == 1)

    new_carry = jnp.concatenate(
        [c_m, c_slp, c_dev, c_rank, c_trig, c_fk, c_r, c_z], axis=0)

    # --- per-beam hit accumulation: hp[b] = pid+1 of the first trigger ---
    # First triggers are sparse (<= one per beam, ~3 per block) and the
    # stream is beam-sorted, so the dense (8, 128, g_pad) one-hot reduce —
    # formerly ~75% of this kernel — shrinks to 128-beam windows gated on
    # the block's triggered-beam range (blocks with no trigger skip all).
    ftv = jnp.where(first_trig, pid + F32(1), F32(0))
    fkt_mn = jnp.min(jnp.where(first_trig, fk, I32(1 << 30)))
    fkt_mx = jnp.max(jnp.where(first_trig, fk, I32(-1)))
    for lo in range(0, g_pad, _LANES):
        @pl.when((fkt_mx >= lo) & (fkt_mn < lo + _LANES))
        def _(lo=lo):
            gid = lo + jax.lax.broadcasted_iota(I32, (1, 1, _LANES), 2)
            hp_acc[:, lo:lo + _LANES] += jnp.sum(
                jnp.where(fk[:, :, None] == gid, ftv[:, :, None], F32(0)),
                axis=1)  # (rows, LANES)

    return new_carry


def star_scan_pallas(fk_s, r_s, z_s, pid_s, *,
                     slope_param, kdev, kdist, dmin, num_beams: int,
                     interpret: bool = False, rows: int = _ROWS,
                     bps: int = _BPS):
    """Returns hp: (num_beams,) i32, hp[b] = 1 + pid of beam b's first
    triggering point (0 = none).  Inputs are the 4 beam-sorted streams
    straight off the sort — slopes, reset flags and walk masks are derived
    in-kernel (round-4; formerly 7 host-prepped streams).  ``bps``:
    (rows, 128) blocks folded into one grid step (bit-exact; amortizes the
    per-grid-step fixed cost — sweep via tools/bench_star.py --bps)."""
    n = fk_s.shape[0]
    blk = rows * _LANES * bps
    n_pad = _round_up(n, blk)
    g_pad = _round_up(num_beams + 1, _LANES)

    def prep(a, fill, dtype):
        return jnp.full((n_pad,), fill, dtype).at[:n].set(
            a.astype(dtype)).reshape(n_pad // _LANES, _LANES)

    params = jnp.stack([jnp.asarray(slope_param, F32),
                        jnp.asarray(kdev, F32),
                        jnp.asarray(kdist, F32),
                        jnp.asarray(dmin, I32).astype(F32)]).reshape(1, 4)
    args = (
        params,
        prep(fk_s, g_pad - 1, I32),  # padding = sink segment (never in-beam)
        prep(r_s, 0.0, F32),
        prep(z_s, 0.0, F32),
        prep(pid_s, 0.0, F32),
    )
    spec = pl.BlockSpec((rows * bps, _LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    hp_rows = pl.pallas_call(
        functools.partial(_star_scan_kernel, g_pad=g_pad,
                          num_beams=num_beams, rows=rows, bps=bps),
        grid=(n_pad // blk,),
        in_specs=[pl.BlockSpec((1, 4), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)] + [spec] * 4,
        out_specs=pl.BlockSpec((rows, g_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, g_pad), F32),
        scratch_shapes=[pltpu.VMEM((8, _LANES), F32),
                        pltpu.VMEM((rows, g_pad), F32)],
        interpret=interpret,
    )(*args)
    return jnp.sum(hp_rows, axis=0).astype(I32)[:num_beams]
