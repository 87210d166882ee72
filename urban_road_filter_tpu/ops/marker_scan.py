"""Sequential Pallas marker kernel: one streaming pass over the sorted
layout computes all four per-bin marker quantities at once.

The XLA path (ops/markers.py) evaluates FOUR dense (R, P, B) compare-reduce
cubes — each rebuilds the same `bin_of == b` broadcast compare, ~10 ms/step
at batch 16 (device trace r2).  This kernel exploits two structural facts:

  * TPU grids execute in order: iterating (ring, slot-block) in exactly the
    reference's scan order (arc-major, azimuth-minor,
    lidar_segmentation.cpp:295-351) turns the stage into ONLINE per-bin
    running state, the way the C++ updates its marker arrays point by point;
  * slots are azimuth-SORTED per ring, so a 512-slot block spans a narrow,
    contiguous bin range — the bin axis splits into three static 128-bin
    windows and a two-reduce precheck skips windows (and empty blocks)
    the block cannot touch, cutting the (slots x bins) compare volume ~3x.

Orientation: bins ride the SUBLANE axis, slots stay on LANES — no
lane<->sublane relayouts anywhere (Mosaic also refuses bool minor-dim
inserts).  State is a (BPAD, 8) VMEM scratch: per bin
[f, maxd, gstar, x, y, z, -, -]; window k owns sublane rows [128k, 128k+128).
Bit-equality with the XLA path is pinned by tests/test_pallas_interpret.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urban_road_filter_tpu.constants import LABEL_ROAD
from urban_road_filter_tpu.ops.geometry import RingLayout

F32 = jnp.float32
I32 = jnp.int32

N_BINS = 361  # i = 0..360 inclusive (lidar_segmentation.cpp:305)
_WIN = 128  # bins per window (sublane tile)
_NWIN = 3  # 3 * 128 = 384 >= 361
_BPAD = _WIN * _NWIN
_BIG = 3.0e38  # sentinel > any g or d (g <= R*P < 2^24: f32-exact); plain
# Python float: a jnp scalar would be a captured constant, which
# pallas_call rejects.


def _marker_kernel(counts_ref, nring_ref, goff_ref, finit_ref, x_ref, y_ref,
                   z_ref, alpha_ref, label_ref, out_ref, state, *,
                   blocks_per_ring: int, blk_w: int):
    step = pl.program_id(0)
    ring = step // blocks_per_ring
    blk = step % blocks_per_ring

    @pl.when(step == 0)
    def _():
        state[...] = jnp.zeros((_BPAD, 8), F32)
        # f starts from the caller-provided floor (BIG = "none yet" on the
        # single-device path; the GLOBAL per-bin f on the SP second pass —
        # the global min is <= any local contribution, so the running min
        # then equals it throughout).
        state[:, 0:1] = finit_ref[:, 0:1]

    slot0 = blk * blk_w
    slot = slot0 + jax.lax.broadcasted_iota(I32, (1, blk_w), 1)  # (1, W)
    valid = (slot < counts_ref[0, ring]) & (ring < nring_ref[0, 0])

    alpha = alpha_ref[0]  # (1, W)
    a_ok = valid & (alpha >= 0) & (alpha <= F32(360.0))  # NaN compares false
    binf = jnp.where(a_ok, jnp.floor(alpha), F32(-1.0))  # -1 = no bin

    # Block-level bin range for the per-window prechecks (the window loop
    # runs in-kernel: a (steps, windows) grid tripled the per-step fixed
    # cost and re-fetched all five input blocks per window).
    bmn = jnp.min(jnp.where(a_ok, binf, F32(_BIG)))
    bmx = jnp.max(jnp.where(a_ok, binf, F32(-1.0)))

    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]
    label = label_ref[0]
    # Scan position: per-ring offset + local slot (single-device: ring * P;
    # SP: ring * P_glob + wedge prefix — all < 2^24: f32-exact).
    g = (goff_ref[0, ring] + slot).astype(F32)
    d = jnp.sqrt(x * x + y * y)
    road = label == F32(LABEL_ROAD)
    nonroad = (~road) & a_ok
    candpt = road & (d > 0)

    for win in range(_NWIN):
        lo = F32(win * _WIN)

        @pl.when((bmx >= lo) & (bmn < lo + _WIN))
        def _(win=win, lo=lo):
            bins = lo + jax.lax.broadcasted_iota(
                I32, (_WIN, blk_w), 0).astype(F32)  # (WIN, W)
            in_bin = bins == binf  # (WIN, W); binf broadcasts over sublanes

            st = state[pl.ds(win * _WIN, _WIN), :]  # (WIN, 8)
            f_run = st[:, 0:1]  # (WIN, 1)

            nr = in_bin & nonroad
            f_loc = jnp.min(jnp.where(nr, g, _BIG), axis=1, keepdims=True)
            f_new = jnp.minimum(f_run, f_loc)

            cand = in_bin & candpt & (g < f_new)
            d_cand = jnp.where(cand, d, F32(0))
            maxd_loc = jnp.max(d_cand, axis=1, keepdims=True)  # (WIN, 1)

            maxd_run = st[:, 1:2]
            better = maxd_loc > maxd_run  # strict: earlier winners keep ties

            att = cand & (d_cand == maxd_loc)
            gstar_loc = jnp.min(jnp.where(att, g, _BIG), axis=1,
                                keepdims=True)
            mine = att & (g == gstar_loc)

            def pick(v):  # winner's coordinate (exactly one slot in `mine`)
                return jnp.sum(jnp.where(mine, v, F32(0)), axis=1,
                               keepdims=True)

            new = jnp.concatenate([
                f_new,
                jnp.where(better, maxd_loc, maxd_run),
                jnp.where(better, gstar_loc, st[:, 2:3]),
                jnp.where(better, pick(x), st[:, 3:4]),
                jnp.where(better, pick(y), st[:, 4:5]),
                jnp.where(better, pick(z), st[:, 5:6]),
                st[:, 6:8],
            ], axis=1)
            state[pl.ds(win * _WIN, _WIN), :] = new

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = state[...]


def marker_state_pallas(layout: RingLayout, num_rings, g_offset=None,
                        f_init=None, interpret: bool = False):
    """Raw per-bin marker state (BPAD, 8) f32 [f, maxd, gstar, x, y, z, -, -]
    from the azimuth-sorted layout.

    g_offset: (R,) i32 scan-position offset per ring (default ring * P; the
    SP path passes ring * P_glob + wedge prefix so g matches the global
    scan order).  f_init: (361,) f32 initial per-bin f floor (default BIG;
    the SP second pass passes the psum-combined global f so candidates are
    gated on it — see parallel/azimuth_parallel._markers_sharded)."""
    r, p = layout.alpha.shape
    blk_w = math.gcd(p, 1024)  # slots per grid step: largest power-of-two
    # divisor of p <= 1024 (PipelineDims guarantees p % 128 == 0, so >= 128)
    blocks_per_ring = p // blk_w

    counts = layout.counts.astype(I32).reshape(1, r)
    nring = jnp.full((1, 1), num_rings, I32)
    if g_offset is None:
        g_offset = jnp.arange(r, dtype=I32) * I32(p)
    goff = g_offset.astype(I32).reshape(1, r)
    finit = jnp.full((_BPAD, 8), _BIG, F32)
    if f_init is not None:
        finit = finit.at[:N_BINS, 0].set(f_init.astype(F32))

    def blk3(a):  # (R, P) -> (R*blocks, 1, W) block rows
        return a.reshape(r * blocks_per_ring, 1, blk_w)

    return pl.pallas_call(
        functools.partial(_marker_kernel,
                          blocks_per_ring=blocks_per_ring, blk_w=blk_w),
        grid=(r * blocks_per_ring,),
        in_specs=[
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # num_rings
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # g offsets
            pl.BlockSpec((_BPAD, 8), lambda i: (0, 0)),  # f init
        ] + [pl.BlockSpec((1, 1, blk_w), lambda i: (i, 0, 0))] * 5,
        out_specs=pl.BlockSpec((_BPAD, 8), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((_BPAD, 8), F32),
        scratch_shapes=[pltpu.VMEM((_BPAD, 8), F32)],
        interpret=interpret,
    )(counts, nring, goff, finit, blk3(layout.x), blk3(layout.y),
      blk3(layout.z), blk3(layout.alpha), blk3(layout.label.astype(F32)))


def _marker_f_kernel(counts_ref, nring_ref, alpha_ref, label_ref, out_ref,
                     state, *, blocks_per_ring: int, blk_w: int,
                     rows_per_step: int):
    """Pass 1 of the SORT-FREE marker path (round 3): per-bin lexicographic
    minimum key (ring, alpha, slot) over NON-ROAD points, streamed over the
    UNSORTED tensorize layout.

    Key order (ring, alpha, slot) == scan position in the azimuth-sorted
    traversal (the stable sort orders by alpha with slot = input order on
    ties), so this replaces the 13.3 ms/step azimuth sort + sorted-g
    bookkeeping bit-for-bit: both paths compare the same f32 alpha values
    of the same layout.

    rows_per_step (ring, blk) rows ride one grid step (an in-kernel loop):
    per-row work is unchanged, but the grid's fixed per-step cost — the
    dominant term at (1, blk_w) blocks, see PERF.md round 4 — is amortized
    rows_per_step x.  The key-compare update is order-independent, so the
    fold cannot change results (and the loop preserves order anyway)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state[...] = jnp.full((_BPAD, 8), _BIG, F32)

    # (Round-3 dead end, measured: splitting the block into 4 sublane
    # sub-rows so each touches ~1 bin window REGRESSED the step 213 -> 241
    # ms at b128 — 4x the pl.when branches and state RMWs plus narrower
    # vector ops cost more than the skipped compare volume saved.)
    for j in range(rows_per_step):
        row = step * rows_per_step + j
        ring = row // blocks_per_ring
        blk = row % blocks_per_ring
        slot = (blk * blk_w + jax.lax.broadcasted_iota(I32, (1, blk_w), 1))
        valid = (slot < counts_ref[0, ring]) & (ring < nring_ref[0, 0])
        alpha = alpha_ref[j]
        a_ok = valid & (alpha >= 0) & (alpha <= F32(360.0))
        binf = jnp.where(a_ok, jnp.floor(alpha), F32(-1.0))
        nonroad = (~(label_ref[j] == F32(LABEL_ROAD))) & a_ok
        ring_f = F32(1) * ring  # f32 ring id (R*P < 2^24: keys f32-exact)
        slot_f = slot.astype(F32)
        bmn = jnp.min(jnp.where(nonroad, binf, F32(_BIG)))
        bmx = jnp.max(jnp.where(nonroad, binf, F32(-1.0)))

        for win in range(_NWIN):
            lo = F32(win * _WIN)

            @pl.when((bmx >= lo) & (bmn < lo + _WIN))
            def _(win=win, lo=lo, alpha=alpha, nonroad=nonroad, binf=binf,
                  slot_f=slot_f):
                bins = lo + jax.lax.broadcasted_iota(
                    I32, (_WIN, alpha.shape[1]), 0).astype(F32)
                nr = (bins == binf) & nonroad  # (WIN, sub)

                a_min = jnp.min(jnp.where(nr, alpha, _BIG), axis=1,
                                keepdims=True)  # (WIN, 1)
                s_min = jnp.min(jnp.where(nr & (alpha == a_min), slot_f,
                                          _BIG), axis=1, keepdims=True)
                st = state[pl.ds(win * _WIN, _WIN), :]
                kf_r, kf_a, kf_s = st[:, 0:1], st[:, 1:2], st[:, 2:3]
                has = a_min < _BIG
                # Streaming is ring-major: a later ring never beats an
                # earlier Kf; equal ring compares (alpha, slot).
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
        out_ref[...] = state[...]


def _marker_cand_kernel(counts_ref, nring_ref, kf_ref, alpha_ref, d_ref,
                        label_ref, out_ref, state, *, blocks_per_ring: int,
                        blk_w: int, rows_per_step: int):
    """Pass 2: per-bin farthest road point BEFORE the pass-1 key, with the
    reference's strict-> update (first point in traversal order wins ties):
    winner = lexicographic min (ring, alpha, slot) among d == maxd.
    rows_per_step: see _marker_f_kernel (same order-independent fold)."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        state[...] = jnp.zeros((_BPAD, 8), F32)

    for j in range(rows_per_step):
        row = step * rows_per_step + j
        ring = row // blocks_per_ring
        blk = row % blocks_per_ring
        slot = (blk * blk_w + jax.lax.broadcasted_iota(I32, (1, blk_w), 1))
        valid = (slot < counts_ref[0, ring]) & (ring < nring_ref[0, 0])
        alpha = alpha_ref[j]
        a_ok = valid & (alpha >= 0) & (alpha <= F32(360.0))
        binf = jnp.where(a_ok, jnp.floor(alpha), F32(-1.0))
        d = d_ref[j]
        candpt = (label_ref[j] == F32(LABEL_ROAD)) & a_ok & (d > 0)
        ring_f = F32(1) * ring
        slot_f = slot.astype(F32)
        bmn = jnp.min(jnp.where(candpt, binf, F32(_BIG)))
        bmx = jnp.max(jnp.where(candpt, binf, F32(-1.0)))

        for win in range(_NWIN):
            lo = F32(win * _WIN)

            @pl.when((bmx >= lo) & (bmn < lo + _WIN))
            def _(win=win, lo=lo, alpha=alpha, binf=binf, d=d,
                  candpt=candpt, slot_f=slot_f):
                bins = lo + jax.lax.broadcasted_iota(
                    I32, (_WIN, alpha.shape[1]), 0).astype(F32)
                in_bin = bins == binf

                kf = kf_ref[pl.ds(win * _WIN, _WIN), :]
                kf_r, kf_a, kf_s = kf[:, 0:1], kf[:, 1:2], kf[:, 2:3]
                before_f = (ring_f < kf_r) | ((ring_f == kf_r) & (
                    (alpha < kf_a) | ((alpha == kf_a) & (slot_f < kf_s))))
                cand = in_bin & candpt & before_f  # (WIN, sub)

                d_c = jnp.where(cand, d, F32(0))
                maxd_loc = jnp.max(d_c, axis=1, keepdims=True)
                att = cand & (d_c == maxd_loc)
                a_min = jnp.min(jnp.where(att, alpha, _BIG), axis=1,
                                keepdims=True)
                s_min = jnp.min(jnp.where(att & (alpha == a_min), slot_f,
                                          _BIG), axis=1, keepdims=True)

                st = state[pl.ds(win * _WIN, _WIN), :]
                maxd_run = st[:, 0:1]
                w_r, w_a, w_s = st[:, 1:2], st[:, 2:3], st[:, 3:4]
                better = maxd_loc > maxd_run
                # Equal-distance tie: earlier traversal key wins; the
                # key-compare update is order-independent, so sub-block
                # arrival order cannot change the result.
                tie = (maxd_loc == maxd_run) & (maxd_loc > 0) & (
                    (ring_f < w_r) | ((ring_f == w_r) & (
                        (a_min < w_a) | ((a_min == w_a) & (s_min < w_s)))))
                take = better | tie
                new = jnp.concatenate([
                    jnp.where(take, maxd_loc, maxd_run),
                    jnp.where(take, ring_f, w_r),
                    jnp.where(take, a_min, w_a),
                    jnp.where(take, s_min, w_s),
                    st[:, 4:8],
                ], axis=1)
                state[pl.ds(win * _WIN, _WIN), :] = new

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = state[...]


def marker_points_unsorted_pallas(layout: RingLayout, num_rings, kf=None,
                                  interpret: bool = False,
                                  rows_per_step: int = 8):
    """Dense (361, 6) marker table from the UNSORTED tensorize layout — the
    azimuth sort is eliminated (its only consumer was this stage): two
    streaming passes replace sort + one pass, and the <=361 winner
    coordinates come back through a tiny (ring, slot) gather.

    kf: optional precomputed pass-1 state (384, 8) — the flood fill's fused
    labeled pass produces it for free (flood_scan.labeled_markerf_pallas),
    skipping the separate pass-1 kernel.

    rows_per_step: (ring, blk) rows folded into each grid step (amortizes
    the fixed per-grid-step cost; see PERF.md round 4)."""
    r, p = layout.alpha.shape
    blk_w = math.gcd(p, 1024)
    blocks_per_ring = p // blk_w
    n_rows = r * blocks_per_ring
    k = math.gcd(n_rows, rows_per_step)

    counts = layout.counts.astype(I32).reshape(1, r)
    nring = jnp.full((1, 1), num_rings, I32)

    def blk3(a):
        return a.reshape(n_rows, 1, blk_w)

    common = dict(grid=(n_rows // k,), interpret=interpret)
    smem = [pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM)]
    stream = lambda: pl.BlockSpec((k, 1, blk_w), lambda i: (i, 0, 0))
    state_spec = pl.BlockSpec((_BPAD, 8), lambda i: (0, 0))

    if kf is None:
        kf = pl.pallas_call(
            functools.partial(_marker_f_kernel,
                              blocks_per_ring=blocks_per_ring, blk_w=blk_w,
                              rows_per_step=k),
            in_specs=smem + [stream(), stream()],
            out_specs=state_spec,
            out_shape=jax.ShapeDtypeStruct((_BPAD, 8), F32),
            scratch_shapes=[pltpu.VMEM((_BPAD, 8), F32)],
            **common,
        )(counts, nring, blk3(layout.alpha),
          blk3(layout.label.astype(F32)))

    st = pl.pallas_call(
        functools.partial(_marker_cand_kernel,
                          blocks_per_ring=blocks_per_ring, blk_w=blk_w,
                          rows_per_step=k),
        in_specs=smem + [state_spec, stream(), stream(), stream()],
        out_specs=state_spec,
        out_shape=jax.ShapeDtypeStruct((_BPAD, 8), F32),
        scratch_shapes=[pltpu.VMEM((_BPAD, 8), F32)],
        **common,
    )(counts, nring, kf, blk3(layout.alpha), blk3(layout.d2),
      blk3(layout.label.astype(F32)))

    maxd = st[:N_BINS, 0]
    exists = maxd > 0
    win_ring = jnp.where(exists, st[:N_BINS, 1], F32(0)).astype(I32)
    win_slot = jnp.where(exists, st[:N_BINS, 3], F32(0)).astype(I32)
    # <=361 winner coordinates by (ring, slot) gather — the unsorted slot
    # IS the layout address, so no pid/permutation is needed.
    px = jnp.where(exists, layout.x[win_ring, win_slot], F32(0))
    py = jnp.where(exists, layout.y[win_ring, win_slot], F32(0))
    pz = jnp.where(exists, layout.z[win_ring, win_slot], F32(0))
    red = (kf[:N_BINS, 0] < _BIG).astype(F32)
    bins = jnp.arange(N_BINS, dtype=F32)
    return jnp.stack([exists.astype(F32), px, py, pz, red, bins], axis=1)


def marker_points_pallas(layout: RingLayout, num_rings, interpret: bool = False):
    """Dense (361, 6) marker table [exists, x, y, z, red, bin] from the
    azimuth-sorted layout — matches ops.markers.marker_points exactly."""
    out = marker_state_pallas(layout, num_rings, interpret=interpret)
    f_g = out[:N_BINS, 0]
    maxd = out[:N_BINS, 1]
    px, py, pz = out[:N_BINS, 3], out[:N_BINS, 4], out[:N_BINS, 5]
    exists = maxd > 0
    red = (f_g < _BIG).astype(F32)
    bins = jnp.arange(N_BINS, dtype=F32)
    return jnp.stack([exists.astype(F32), px, py, pz, red, bins], axis=1)
