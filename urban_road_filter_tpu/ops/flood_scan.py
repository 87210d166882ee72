"""Pallas flood-fill pass: blocked bits + labeled mask with window skipping.

The XLA path (ops/blind_spots.py) evaluates the two existential quantifiers
of the road-reachability computation as dense compare-reduce cubes —
blocked: two pred (R, P, NI) reduces over slots, labeled: two pred
(R, P, NI) reduces over starts — ~35 ms/step at batch 128 (device trace
r2 step 14).  These kernels exploit the same structural fact as the marker
kernel (ops/marker_scan.py): slots within a ring block span a narrow
azimuth range, so the 362 sweep-start axis splits into three static
128-start windows (starts ride SUBLANES, slots stay on LANES — no
lane<->sublane relayouts) and a cheap min/max precheck skips windows the
block cannot touch.  The layout need not be azimuth-sorted for
correctness — the precheck uses the block's actual range — but
near-sortedness (firing order) is what makes the skipping effective.

Semantics match ops/blind_spots.py bit-for-bit (pinned by
tests/test_pallas_interpret.py): per-(ring, start) windows
[i, i+w_k] / [i-w_k, i] in f32, the `i == 360-beamZone` / `i == beamZone`
exact-equality specials for rings k >= 1 (blind_spots.cpp:136-143,
244-251), NaN azimuths never blocking and never labeled (NaN compares
false, like the C++ walk).

Reference: blind_spots.cpp:7-284.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urban_road_filter_tpu.constants import LABEL_CURB

F32 = jnp.float32
I32 = jnp.int32

_WIN = 128  # starts per window (sublane tile)
_NWIN = 3  # 3 * 128 = 384 >= 362
_SPAD = _WIN * _NWIN
_BIG = 3.0e38


def _win_starts(win: int):
    """(WIN, 1) f32 column of start angles for window `win`."""
    return F32(win * _WIN) + jax.lax.broadcasted_iota(
        I32, (_WIN, 1), 0).astype(F32)


def _blocked_kernel(bz_ref, counts_ref, w_ref, alpha_ref, label_ref,
                    out_ref, state, *, blocks_per_ring: int, blk_w: int,
                    rows_per_step: int):
    """rows_per_step is a multiple of blocks_per_ring (whole rings per grid
    step), so the per-ring state reset/flush become STATIC per-j events of
    the in-kernel row loop — the fold amortizes the fixed per-grid-step
    cost (PERF.md round 4) and drops the two pl.when branches the unfolded
    kernel paid per step."""
    step = pl.program_id(0)
    bz = bz_ref[0, 0]
    sp_f = F32(360) - bz
    sp_b = bz

    for j in range(rows_per_step):
        row = step * rows_per_step + j
        ring = row // blocks_per_ring
        blk = j % blocks_per_ring  # static: rows_per_step % bpr == 0
        ring_local = j // blocks_per_ring

        if blk == 0:
            state[...] = jnp.zeros((_SPAD, 8), F32)

        slot0 = blk * blk_w
        slot = slot0 + jax.lax.broadcasted_iota(I32, (1, blk_w), 1)
        valid = slot < counts_ref[0, ring]

        alpha = alpha_ref[j]  # (1, W)
        label = label_ref[j]
        curb = valid & (label == F32(LABEL_CURB))

        # Block curb-azimuth range for the prechecks.  NaN azimuths are
        # excluded here (they would poison the min/max) but kept raw in the
        # in-window compares below, where IEEE NaN-compares-false
        # reproduces the XLA/C++ "NaN never blocks" semantics.
        a_fin = curb & (alpha >= F32(-_BIG)) & (alpha <= F32(_BIG))
        amn = jnp.min(jnp.where(a_fin, alpha, F32(_BIG)))
        amx = jnp.max(jnp.where(a_fin, alpha, F32(-_BIG)))

        w = w_ref[0, ring]  # window width, degrees (f32; inf if empty)
        ring_ge1 = ring >= 1
        # Exact-equality specials only bind when 360-bz / bz are integral
        # (starts are integers) — the `i_col == sp` compare below encodes
        # that for free.  bz rides SMEM (dynamic operand, hot-swap without
        # re-trace); `F32(360) - bz` matches sweep_bounds bit-for-bit.

        for win in range(_NWIN):
            s0 = F32(win * _WIN)
            s1 = F32(win * _WIN + _WIN - 1)
            i_col = _win_starts(win)

            # Forward sweep: window [i, i+w] (hi -> 360 at the special
            # start).  The special's hi=360 covers any amn; activating on
            # a non-integral sp_f is harmless (no i_col can equal it).
            act_f = ((s0 <= amx) & (s1 + w >= amn)) | (
                (s0 <= sp_f) & (sp_f <= s1) & (sp_f <= amx))

            @pl.when(act_f)
            def _(win=win, i_col=i_col, alpha=alpha, curb=curb,
                  ring_ge1=ring_ge1, w=w):
                hi = jnp.where((i_col == sp_f) & ring_ge1, F32(360),
                               i_col + w)
                in_win = (alpha >= i_col) & (alpha <= hi) & curb  # (WIN, W)
                got = jnp.max(jnp.where(in_win, F32(1), F32(0)), axis=1,
                              keepdims=True)
                state[pl.ds(win * _WIN, _WIN), 0:1] = jnp.maximum(
                    state[pl.ds(win * _WIN, _WIN), 0:1], got)

            # Backward sweep: window [i-w, i] (lo -> 0 at the special).
            act_b = ((s1 >= amn) & (s0 <= amx + w)) | (
                (s0 <= sp_b) & (sp_b <= s1) & (sp_b >= amn))

            @pl.when(act_b)
            def _(win=win, i_col=i_col, alpha=alpha, curb=curb,
                  ring_ge1=ring_ge1, w=w):
                lo = jnp.where((i_col == sp_b) & ring_ge1, F32(0),
                               i_col - w)
                in_win = (alpha >= lo) & (alpha <= i_col) & curb
                got = jnp.max(jnp.where(in_win, F32(1), F32(0)), axis=1,
                              keepdims=True)
                state[pl.ds(win * _WIN, _WIN), 1:2] = jnp.maximum(
                    state[pl.ds(win * _WIN, _WIN), 1:2], got)

        if blk == blocks_per_ring - 1:
            # (SPAD, 8) -> (8, SPAD) so the HBM output's minor dim is a
            # full lane multiple (a minor dim of 8 tile-pads 16x in HBM —
            # the padded writes cost more than this small relayout/ring).
            out_ref[ring_local] = state[...].T


def blocked_pallas(layout, w, bz, interpret: bool = False,
                   rows_per_step: int = 8):
    """(blocked_fwd, blocked_bwd), each (R, 362) bool: any curb point of
    ring k inside the sweep window of start i (ops/blind_spots.py
    `blocked_bits` for both sweep directions in one pass)."""
    r, p = layout.alpha.shape
    blk_w = math.gcd(p, 1024)  # largest power-of-two divisor of p <= 1024
    blocks_per_ring = p // blk_w
    # Whole rings per grid step: k = bpr * m with m | r, m ~ rows_per_step
    # / bpr (the per-ring state flush must land inside one step).
    m = math.gcd(r, max(1, rows_per_step // blocks_per_ring))
    k = blocks_per_ring * m

    counts = layout.counts.astype(I32).reshape(1, r)
    w2 = w.astype(F32).reshape(1, r)
    bzs = jnp.asarray(bz, F32).reshape(1, 1)

    def blk3(a):
        return a.reshape(r * blocks_per_ring, 1, blk_w)

    out = pl.pallas_call(
        functools.partial(_blocked_kernel, blocks_per_ring=blocks_per_ring,
                          blk_w=blk_w, rows_per_step=k),
        grid=(r * blocks_per_ring // k,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # beam zone
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # window widths
            pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0)),  # alpha
            pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0)),  # label
        ],
        out_specs=pl.BlockSpec((m, 8, _SPAD), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r, 8, _SPAD), F32),
        scratch_shapes=[pltpu.VMEM((_SPAD, 8), F32)],
        interpret=interpret,
    )(bzs, counts, w2, blk3(layout.alpha), blk3(layout.label.astype(F32)))
    return out[:, 0, :362] > 0, out[:, 1, :362] > 0


def _labeled_kernel(bz_ref, counts_ref, w_ref, reach_ref, alpha_ref,
                    out_ref, *, blocks_per_ring: int, blk_w: int, r: int,
                    rows_per_step: int):
    """rows_per_step (ring, blk) rows per grid step (in-kernel loop) —
    amortizes the fixed per-grid-step cost (PERF.md round 4); per-row work
    and results are unchanged.  rows_per_step is a multiple of
    blocks_per_ring (whole rings per step), so the per-ring reach-column
    extraction hoists to a STATIC once-per-ring event of the row loop.
    Measured NEUTRAL (PERF.md step 27: Mosaic had already CSE'd the
    duplicate per-row extractions); kept for clarity and to guard future
    rows_per_step changes."""
    step = pl.program_id(0)
    bz = bz_ref[0, 0]
    sp_f = F32(360) - bz
    sp_b = bz
    # This ring's reach columns (fwd at `ring`, bwd at `r + ring`) out of
    # the lane-resident (SPAD, 2R) table, extracted by masked lane-reduce
    # (a width-1 dynamic lane slice is not liftable; a (SPAD, 2R) select +
    # reduce is one cheap VPU pass and keeps every HBM array lane-major).
    lane = jax.lax.broadcasted_iota(I32, (_SPAD, 2 * r), 1)
    tbl = reach_ref[...]

    reach = [None]
    for j in range(rows_per_step):
        row = step * rows_per_step + j
        if j % blocks_per_ring == 0:  # static: new ring opens here
            ring = row // blocks_per_ring
            reach[0] = (
                jnp.max(jnp.where(lane == ring, tbl, F32(0)), axis=1,
                        keepdims=True),  # (SPAD, 1)
                jnp.max(jnp.where(lane == r + ring, tbl, F32(0)), axis=1,
                        keepdims=True))
        _labeled_row(j, row, counts_ref, w_ref, alpha_ref, out_ref,
                     reach[0], sp_f, sp_b,
                     blocks_per_ring=blocks_per_ring, blk_w=blk_w, r=r)


def _labeled_row(j, row, counts_ref, w_ref, alpha_ref, out_ref, reach_fb,
                 sp_f, sp_b, *, blocks_per_ring: int, blk_w: int, r: int):
    ring = row // blocks_per_ring
    blk = row % blocks_per_ring

    slot0 = blk * blk_w
    slot = slot0 + jax.lax.broadcasted_iota(I32, (1, blk_w), 1)
    valid = slot < counts_ref[0, ring]

    alpha = alpha_ref[j]  # (1, W)
    a_ok = valid & (alpha >= 0) & (alpha <= F32(360))  # NaN/inf excluded

    amn = jnp.min(jnp.where(a_ok, alpha, F32(_BIG)))
    amx = jnp.max(jnp.where(a_ok, alpha, F32(-_BIG)))

    w = w_ref[0, ring]
    ring_ge1 = ring >= 1

    reach_f, reach_b = reach_fb

    out_ref[j] = jnp.zeros((1, blk_w), F32)

    for win in range(_NWIN):
        s0 = F32(win * _WIN)
        s1 = F32(win * _WIN + _WIN - 1)
        i_col = _win_starts(win)

        # Forward: slot labeled by start i iff reach_f[i] & alpha in
        # [i, i+w] -> i in [alpha-w, alpha]; window precheck vs the
        # block's valid-azimuth range (value-based specials, see
        # _blocked_kernel).
        act_f = ((s0 <= amx) & (s1 + w >= amn)) | (
            (s0 <= sp_f) & (sp_f <= s1) & (sp_f <= amx))

        @pl.when(act_f)
        def _(win=win, i_col=i_col):
            reach = reach_f[win * _WIN:(win + 1) * _WIN, 0:1]  # (WIN, 1)
            hi = jnp.where((i_col == sp_f) & ring_ge1, F32(360),
                           i_col + w)
            cond = (reach > 0) & (alpha >= i_col) & (alpha <= hi)
            got = jnp.max(jnp.where(cond, F32(1), F32(0)), axis=0,
                          keepdims=True)  # (1, W)
            out_ref[j] = jnp.maximum(out_ref[j], got)

        # Backward: alpha in [i-w, i] -> i in [alpha, alpha+w].
        act_b = ((s1 >= amn) & (s0 <= amx + w)) | (
            (s0 <= sp_b) & (sp_b <= s1) & (sp_b >= amn))

        @pl.when(act_b)
        def _(win=win, i_col=i_col):
            reach = reach_b[win * _WIN:(win + 1) * _WIN, 0:1]
            lo = jnp.where((i_col == sp_b) & ring_ge1, F32(0),
                           i_col - w)
            cond = (reach > 0) & (alpha >= lo) & (alpha <= i_col)
            got = jnp.max(jnp.where(cond, F32(1), F32(0)), axis=0,
                          keepdims=True)
            out_ref[j] = jnp.maximum(out_ref[j], got)

    # Padding / invalid-azimuth slots never take a label.
    out_ref[j] = jnp.where(a_ok, out_ref[j], F32(0))


def _labeled_markerf_kernel(bz_ref, counts_ref, w_ref, reach_ref, alpha_ref,
                            label_ref, out_ref, kf_ref, state, *,
                            blocks_per_ring: int, blk_w: int, r: int,
                            rows_per_step: int):
    """labeled + marker pass 1 FUSED (round 3): the road mask this kernel
    computes per block determines exactly which slots are NON-ROAD after
    the flood fill, so the sort-free marker path's per-bin lexicographic
    (ring, alpha, slot) non-road minimum (ops/marker_scan._marker_f_kernel)
    folds into the same streaming pass — one fewer kernel and one fewer
    read of the alpha stream (the separate pass cost 13.8 ms/step at b128,
    device trace r3).

    rows_per_step (ring, blk) rows ride one grid step (an in-kernel loop),
    amortizing the fixed per-grid-step cost (PERF.md round 4).  Per-row
    work is unchanged; the marker key fold is order-independent, so the
    fold is bit-exact."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state[...] = jnp.full((_SPAD, 8), 3.0e38, F32)

    bz = bz_ref[0, 0]
    sp_f = F32(360) - bz
    sp_b = bz
    lane = jax.lax.broadcasted_iota(I32, (_SPAD, 2 * r), 1)
    tbl = reach_ref[...]

    reach_f = reach_b = None
    for j in range(rows_per_step):
        row = step * rows_per_step + j
        ring = row // blocks_per_ring
        blk = row % blocks_per_ring
        if j % blocks_per_ring == 0:  # static: whole rings per step; the
            # hoist measured NEUTRAL (Mosaic already CSE'd the per-row
            # extractions, PERF.md step 27) — kept for clarity
            reach_f = jnp.max(jnp.where(lane == ring, tbl, F32(0)), axis=1,
                              keepdims=True)  # (SPAD, 1)
            reach_b = jnp.max(jnp.where(lane == r + ring, tbl, F32(0)),
                              axis=1, keepdims=True)
        slot0 = blk * blk_w
        slot = slot0 + jax.lax.broadcasted_iota(I32, (1, blk_w), 1)
        valid = slot < counts_ref[0, ring]

        alpha = alpha_ref[j]  # (1, W)
        a_ok = valid & (alpha >= 0) & (alpha <= F32(360))  # NaN/inf out

        amn = jnp.min(jnp.where(a_ok, alpha, F32(_BIG)))
        amx = jnp.max(jnp.where(a_ok, alpha, F32(-_BIG)))

        w = w_ref[0, ring]
        ring_ge1 = ring >= 1

        out_ref[j] = jnp.zeros((1, blk_w), F32)

        for win in range(_NWIN):
            s0 = F32(win * _WIN)
            s1 = F32(win * _WIN + _WIN - 1)
            i_col = _win_starts(win)

            act_f = ((s0 <= amx) & (s1 + w >= amn)) | (
                (s0 <= sp_f) & (sp_f <= s1) & (sp_f <= amx))

            @pl.when(act_f)
            def _(win=win, i_col=i_col, j=j, alpha=alpha, reach_f=reach_f,
                  ring_ge1=ring_ge1, w=w):
                reach = reach_f[win * _WIN:(win + 1) * _WIN, 0:1]
                hi = jnp.where((i_col == sp_f) & ring_ge1, F32(360),
                               i_col + w)
                cond = (reach > 0) & (alpha >= i_col) & (alpha <= hi)
                got = jnp.max(jnp.where(cond, F32(1), F32(0)), axis=0,
                              keepdims=True)
                out_ref[j] = jnp.maximum(out_ref[j], got)

            act_b = ((s1 >= amn) & (s0 <= amx + w)) | (
                (s0 <= sp_b) & (sp_b <= s1) & (sp_b >= amn))

            @pl.when(act_b)
            def _(win=win, i_col=i_col, j=j, alpha=alpha, reach_b=reach_b,
                  ring_ge1=ring_ge1, w=w):
                reach = reach_b[win * _WIN:(win + 1) * _WIN, 0:1]
                lo = jnp.where((i_col == sp_b) & ring_ge1, F32(0),
                               i_col - w)
                cond = (reach > 0) & (alpha >= lo) & (alpha <= i_col)
                got = jnp.max(jnp.where(cond, F32(1), F32(0)), axis=0,
                              keepdims=True)
                out_ref[j] = jnp.maximum(out_ref[j], got)

        # Padding / invalid-azimuth slots never take a label.
        out_ref[j] = jnp.where(a_ok, out_ref[j], F32(0))

        # ---- marker pass 1 on the block's FINAL road state ----
        # Post-flood label == ROAD  <=>  road mask & pre-label != CURB (the
        # sweeps are the only road writer; pre-labels are {0, CURB}).
        label = label_ref[j]
        road_fin = (out_ref[j] > 0) & (label != F32(LABEL_CURB))
        nonroad = a_ok & ~road_fin
        binf = jnp.where(nonroad, jnp.floor(alpha), F32(-1.0))
        bmn2 = jnp.min(jnp.where(nonroad, binf, F32(_BIG)))
        bmx2 = jnp.max(jnp.where(nonroad, binf, F32(-1.0)))
        ring_f = F32(1) * ring  # keys < 2^24: f32-exact
        slot_f = slot.astype(F32)

        for win in range(_NWIN):
            lo = F32(win * _WIN)

            @pl.when((bmx2 >= lo) & (bmn2 < lo + _WIN))
            def _(win=win, lo=lo, alpha=alpha, nonroad=nonroad, binf=binf,
                  slot_f=slot_f, ring_f=ring_f):
                bins = lo + jax.lax.broadcasted_iota(
                    I32, (_WIN, blk_w), 0).astype(F32)
                nr = (bins == binf) & nonroad  # (WIN, W)
                a_min = jnp.min(jnp.where(nr, alpha, F32(_BIG)), axis=1,
                                keepdims=True)
                s_min = jnp.min(jnp.where(nr & (alpha == a_min), slot_f,
                                          F32(_BIG)), axis=1, keepdims=True)
                st = state[pl.ds(win * _WIN, _WIN), :]
                kf_r, kf_a, kf_s = st[:, 0:1], st[:, 1:2], st[:, 2:3]
                has = a_min < F32(_BIG)
                better = has & ((ring_f < kf_r) | (
                    (ring_f == kf_r) & ((a_min < kf_a) | (
                        (a_min == kf_a) & (s_min < kf_s)))))
                new = jnp.concatenate([
                    jnp.where(better, ring_f, kf_r),
                    jnp.where(better, a_min, kf_a),
                    jnp.where(better, s_min, kf_s),
                    st[:, 3:8],
                ], axis=1)
                state[pl.ds(win * _WIN, _WIN), :] = new

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        kf_ref[...] = state[...]


def labeled_markerf_pallas(layout, reach_f, reach_b, w, bz,
                           interpret: bool = False, rows_per_step: int = 8):
    """(road_mask (R, P) bool, kf (384, 8) f32): the flood labeled mask AND
    the marker stage's per-bin non-road key minimum in one streaming pass
    (see _labeled_markerf_kernel).  kf feeds
    ops.marker_scan.marker_points_unsorted_pallas(..., kf=kf)."""
    r, p = layout.alpha.shape
    blk_w = math.gcd(p, 1024)
    blocks_per_ring = p // blk_w
    n_rows = r * blocks_per_ring
    # Whole rings per grid step so the per-ring reach extraction hoists to
    # a static once-per-ring event (see _labeled_markerf_kernel).
    m = math.gcd(r, max(1, rows_per_step // blocks_per_ring))
    k = blocks_per_ring * m

    counts = layout.counts.astype(I32).reshape(1, r)
    w2 = w.astype(F32).reshape(1, r)
    reach = jnp.concatenate([reach_f.astype(F32), reach_b.astype(F32)],
                            axis=0)
    reach = jnp.pad(reach, ((0, 0), (0, _SPAD - reach.shape[1]))).T

    def blk3(a):
        return a.reshape(n_rows, 1, blk_w)

    bzs = jnp.asarray(bz, F32).reshape(1, 1)
    out, kf = pl.pallas_call(
        functools.partial(_labeled_markerf_kernel,
                          blocks_per_ring=blocks_per_ring, blk_w=blk_w, r=r,
                          rows_per_step=k),
        grid=(n_rows // k,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # beam zone
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # window widths
            pl.BlockSpec((_SPAD, 2 * r), lambda i: (0, 0)),  # reach table
            pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0)),  # alpha
            pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0)),  # labels
        ],
        out_specs=(pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0)),
                   pl.BlockSpec((_SPAD, 8), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((n_rows, 1, blk_w), F32),
                   jax.ShapeDtypeStruct((_SPAD, 8), F32)),
        scratch_shapes=[pltpu.VMEM((_SPAD, 8), F32)],
        interpret=interpret,
    )(bzs, counts, w2, reach, blk3(layout.alpha),
      blk3(layout.label.astype(F32)))
    return out.reshape(r, p) > 0, kf


def labeled_pallas(layout, reach_f, reach_b, w, bz,
                   interpret: bool = False, rows_per_step: int = 8):
    """(R, P) bool road mask: slot reachable by any start of either sweep
    (ops/blind_spots.py `labeled_mask` for both sweeps in one pass).
    reach_f/reach_b: (R, 362) bool (already gated on active & ~gate &
    ring_active by the caller)."""
    r, p = layout.alpha.shape
    blk_w = math.gcd(p, 1024)  # largest power-of-two divisor of p <= 1024
    blocks_per_ring = p // blk_w
    n_rows = r * blocks_per_ring
    # Whole rings per grid step (per-ring reach extraction hoist).
    # NOTE: k rounds UP to a whole ring — when blocks_per_ring >
    # rows_per_step (non-power-of-two p), k = blocks_per_ring exceeds the
    # requested rows_per_step, growing the per-step alpha/out VMEM blocks.
    # rows_per_step is therefore a hint, not a cap.
    m = math.gcd(r, max(1, rows_per_step // blocks_per_ring))
    k = blocks_per_ring * m

    counts = layout.counts.astype(I32).reshape(1, r)
    w2 = w.astype(F32).reshape(1, r)

    # One (SPAD, 2R) table: starts on sublanes, fwd reach in columns
    # [0, R), bwd in [R, 2R) — lane-major throughout, resident across the
    # whole grid (constant index map), no 1-lane HBM arrays anywhere.
    reach = jnp.concatenate([reach_f.astype(F32), reach_b.astype(F32)],
                            axis=0)
    reach = jnp.pad(reach, ((0, 0), (0, _SPAD - reach.shape[1]))).T

    def blk3(a):
        return a.reshape(r * blocks_per_ring, 1, blk_w)

    bzs = jnp.asarray(bz, F32).reshape(1, 1)
    out = pl.pallas_call(
        functools.partial(_labeled_kernel, blocks_per_ring=blocks_per_ring,
                          blk_w=blk_w, r=r, rows_per_step=k),
        grid=(n_rows // k,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # beam zone
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # window widths
            pl.BlockSpec((_SPAD, 2 * r), lambda i: (0, 0)),  # reach table
            pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0)),  # alpha
        ],
        out_specs=pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_rows, 1, blk_w), F32),
        interpret=interpret,
    )(bzs, counts, w2, reach, blk3(layout.alpha))
    return out.reshape(r, p) > 0
