"""Fused ingest Pallas kernels (PERF round-5 roadmap #2 / VERDICT r3 item 6).

Two streaming kernels fold the ingest stage's small XLA fusions — each a
separate full-array HBM pass at b128 (device trace, PERF.md step 26:
roi mask 2.15 ms/step, ROI count reduce 2.68, ring assign 2.86, star
sort-key prep ~2) — into single passes over the point streams:

  * ``ingest_prep_pallas``: ROI crop mask (lidar_segmentation.cpp:106-117),
    the star search's polar sector index + 2-D radius sort keys
    (star_shaped_search.cpp:162-174), and the in-ROI point count
    (the ``piece`` guard input, lidar_segmentation.cpp:124) — one read of
    (x, y, z, atan2(y, x)) per point.
  * ``assign_rings_pallas``: first-matching-ring binning against the
    discovered ring table (lidar_segmentation.cpp:226-233) as an unrolled
    in-VMEM loop over the <=64 rings — one read of the vertical angle and
    one write of the ring id, vs XLA's (N, rings) compare cube + argmax.

Both kernels are BATCH-AWARE: they take the native (B, N) streams and
grid over (batch-blocks, point-blocks).  The first (vmapped, per-scan)
version of this file reshaped every stream to (N/128, 128) — each such
reshape is a (8, 128)-tile RETILE copy on TPU, and the seven of them cost
as much as the fusions the kernels removed (measured: 675.5 vs 674.6
scans/s, i.e. FLAT).  (B, N) blocks of shape (8, cols) are tile-native in
both directions, so the kernels' outputs feed the star sort and the rank
kernel with no layout pass.

Division of labor with XLA (tools/probe_ingest_math.py, run on the real
TPU): Mosaic has NO lowering for atan2/asin/acos, so the transcendentals
stay XLA ops whose bit patterns these kernels consume; sqrt, multiply,
truncating int conversion and all comparisons ARE bit-equal between
Mosaic and XLA (probed), so everything downstream of the transcendentals
moves in-kernel.  ``assign_rings_pallas`` therefore takes the vertical
angle MASKED to NaN at non-ROI points (NaN compares false against every
ring, exactly like the reference's dropped points) instead of a second
validity stream.

Interpret-mode bit-equality vs the XLA formulations is pinned in
tests/test_pallas_interpret.py.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urban_road_filter_tpu.constants import STAR_KFI, STAR_REP

F32 = jnp.float32
I32 = jnp.int32

_LANES = 128
# Lanes (points) per block; sweep via tools/bench_ingest.py (the
# per-grid-step fixed cost rules streaming kernels — PERF.md round-4
# lesson; re-sweep after any restructure).  URF_INGEST_COLS overrides at
# trace time for sweeps.
_COLS = int(os.environ.get("URF_INGEST_COLS", 8192))
_BB = 8  # batch rows per block (the f32 sublane tile)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _check_cols_env(cols_used: int) -> None:
    """URF_INGEST_COLS is captured at import into _COLS (and into the
    wrappers' defaults); flipping it mid-process after a graph is cached
    would silently reuse the old variant (ADVICE r4).  Fail loudly at
    trace time instead."""
    env = os.environ.get("URF_INGEST_COLS")
    if env is not None and int(env) != _COLS:
        raise RuntimeError(
            f"URF_INGEST_COLS changed mid-process ({env} vs the "
            f"import-time {_COLS}); it is a trace-time knob — set it "
            f"before the process starts (one variant per process)")
    del cols_used


def _grid_dims(b: int, n: int, cols: int):
    bb = min(_BB, b)
    if b % bb:
        bb = math.gcd(b, bb)
    # Blocks must stay LANE-aligned: a lane-unaligned Mosaic block fails
    # to compile, and a failed Mosaic compile poisons the axon server for
    # the rest of the process (CLAUDE.md).  Fail on the host instead.
    if n % _LANES:
        raise ValueError(
            f"ingest kernels need the point count to be a multiple of "
            f"{_LANES} lanes, got n={n}")
    cols = max(min(cols, n), _LANES)
    if n % cols:
        # Largest-gcd divisor of n that is a multiple of 128 and <= cols.
        cols = math.gcd(n // _LANES, cols // _LANES) * _LANES
    return bb, cols, b // bb, n // cols


# ---------------------------------------------------------------------------
# Kernel A: ROI mask + star polar keys + in-ROI count, one pass.
# ---------------------------------------------------------------------------


def _ingest_prep_kernel(*refs, star: bool):
    if star:
        (params_ref, x_ref, y_ref, z_ref, fi_ref,
         valid_ref, fk_ref, rk_ref, cnt_ref) = refs
    else:
        params_ref, x_ref, y_ref, z_ref, valid_ref, cnt_ref = refs

    @pl.when(pl.program_id(1) == 0)
    def _():
        cnt_ref[...] = jnp.zeros_like(cnt_ref)

    min_x = params_ref[0, 0]
    max_x = params_ref[0, 1]
    min_y = params_ref[0, 2]
    max_y = params_ref[0, 3]
    min_z = params_ref[0, 4]
    max_z = params_ref[0, 5]

    xx = x_ref[...]
    yy = y_ref[...]
    zz = z_ref[...]

    # ROI crop + zero-point drop (lidar_segmentation.cpp:106-117);
    # identical compare chain to ops/geometry.roi_mask.
    valid = ((xx >= min_x) & (xx <= max_x)
             & (yy >= min_y) & (yy <= max_y)
             & (zz >= min_z) & (zz <= max_z)
             & (xx + yy + zz != F32(0)))

    if star:
        fi = fi_ref[...]
        # Star polar binning (star_shaped_search.cpp:162-174): 2-D radius +
        # truncating sector index from the XLA-computed atan2.  sqrt/mul/
        # trunc-convert are Mosaic<->XLA bit-equal (probe_ingest_math.py).
        r = jnp.sqrt(xx * xx + yy * yy)
        fiw = jnp.where(fi < 0, fi + F32(2.0 * math.pi), fi)
        f = (fiw * F32(STAR_KFI)).astype(I32)
        # f == STAR_REP is reachable (fi a few ulps under 2pi rounds up
        # after the f32 multiply); equal to ops/star.py's `% STAR_REP`
        # since 0 <= f <= STAR_REP.
        f = jnp.where(f >= I32(STAR_REP), f - I32(STAR_REP), f)
        fk_ref[...] = jnp.where(valid, f, I32(STAR_REP))
        rk_ref[...] = jnp.where(valid, r, jnp.inf)

    valid_ref[...] = valid
    # Per-scan in-ROI count partial: a cross-lane reduce to (bb, 1),
    # broadcast-accumulated over the count block's 128 lanes (the caller
    # reads lane 0).  Scans ride the SUBLANE axis, so per-scan counts
    # stay per-sublane.
    cnt_ref[...] += jnp.sum(valid.astype(I32), axis=1, keepdims=True)


def ingest_prep_pallas(x, y, z, fi_raw, cfg, *, interpret: bool = False,
                       cols: int = _COLS, want_star_keys: bool = True):
    """One streaming pass over the (B, N) streams (x, y, z, atan2(y, x)):

      valid: (B, N) bool — the ROI mask (== ops.geometry.roi_mask);
      fk:    (B, N) i32 — star sector per point, STAR_REP for dropped
             points (== ops.star's pre-sort key with keep == valid);
      r_key: (B, N) f32 — 2-D radius, +inf for dropped points;
      piece: (B,)   i32 — in-ROI point count (the >=30 guard input).

    ``fi_raw`` is the raw atan2 (may be negative; wrapped in-kernel —
    exact, a single f32 add).  The starbeam rectangle refinement
    (star_shaped_search.cpp:73-107) stays outside: it needs 360-entry
    table lookups per point (the measured lane-gather dead-end class) and
    only runs in starbeam configs; ops/star.py refines fk/r_key from this
    kernel's outputs there.

    ``want_star_keys=False`` (non-star configs; a STATIC trace-time flag
    like cfg.star_shaped_method itself) skips the fk/rk math and their
    two (B, N) HBM stores entirely — the opaque pallas_call would
    otherwise prevent XLA from dead-code-eliminating them (ADVICE r4);
    returns fk = rk = None.
    """
    b, n = x.shape
    _check_cols_env(cols)
    bb, cols, n_b, n_n = _grid_dims(b, n, cols)

    params = jnp.stack([jnp.asarray(cfg.min_x, F32),
                        jnp.asarray(cfg.max_x, F32),
                        jnp.asarray(cfg.min_y, F32),
                        jnp.asarray(cfg.max_y, F32),
                        jnp.asarray(cfg.min_z, F32),
                        jnp.asarray(cfg.max_z, F32)]).reshape(1, 6)

    spec = pl.BlockSpec((bb, cols), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    cnt_spec = pl.BlockSpec((bb, _LANES), lambda i, j: (i, 0),
                            memory_space=pltpu.VMEM)
    smem = pl.BlockSpec((1, 6), lambda i, j: (0, 0),
                        memory_space=pltpu.SMEM)
    if want_star_keys:
        valid, fk, rk, cnt = pl.pallas_call(
            functools.partial(_ingest_prep_kernel, star=True),
            grid=(n_b, n_n),
            in_specs=[smem] + [spec] * 4,
            out_specs=(spec, spec, spec, cnt_spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.bool_),
                       jax.ShapeDtypeStruct((b, n), I32),
                       jax.ShapeDtypeStruct((b, n), F32),
                       jax.ShapeDtypeStruct((b, _LANES), I32)),
            interpret=interpret,
        )(params, x, y, z, fi_raw)
        return valid, fk, rk, cnt[:, 0]
    valid, cnt = pl.pallas_call(
        functools.partial(_ingest_prep_kernel, star=False),
        grid=(n_b, n_n),
        in_specs=[smem] + [spec] * 3,
        out_specs=(spec, cnt_spec),
        out_shape=(jax.ShapeDtypeStruct((b, n), jnp.bool_),
                   jax.ShapeDtypeStruct((b, _LANES), I32)),
        interpret=interpret,
    )(params, x, y, z)
    return valid, None, None, cnt[:, 0]


# ---------------------------------------------------------------------------
# Kernel B: greedy ring discovery, whole scans VMEM-resident.
# ---------------------------------------------------------------------------


def _discover_kernel(params_ref, alpha_ref, angles_ref, cnt_ref, work, *,
                     rings: int):
    """The input-order greedy (lidar_segmentation.cpp:168-197) with each
    scan resident in VMEM.  The XLA fori_loop version pays ~4 full-array
    HBM fusions per greedy iteration (device trace: the while body's
    not/and, argmax-reduce and or-update fusions total ~6 ms/step at b128
    ON TOP of the 6.8 ms while op); here the 64 iterations touch HBM only
    once (one alpha read).

    ``matched`` needs no separate buffer: a matched point's alpha is
    overwritten with NaN in the scratch copy, which removes it from
    every later candidate search and tolerance match — exactly the
    valid & ~matched semantics, since non-ROI points arrive as NaN
    already."""
    tol = params_ref[0, 0]
    work[...] = alpha_ref[...]
    bb, n = work.shape
    lane_n = jax.lax.broadcasted_iota(I32, (bb, n), 1)
    lane_r = jax.lax.broadcasted_iota(I32, (bb, _LANES), 1)
    big = I32(n)

    def body(k, st):
        angles_acc, cnt = st
        aw = work[...]
        unm = ~jnp.isnan(aw)
        # First (input-order) unmatched point per scan == the XLA body's
        # argmax-over-bool (first True); min over masked lane index.
        first = jnp.min(jnp.where(unm, lane_n, big), axis=1, keepdims=True)
        has = first < big  # (bb, 1)
        # Its alpha, by one-hot select (where is a SELECT: NaNs at other
        # lanes contribute exact zeros).
        a = jnp.sum(jnp.where(lane_n == first, aw, F32(0)), axis=1,
                    keepdims=True)
        m = jnp.abs(aw - a) <= tol  # NaN rows stay false
        work[...] = jnp.where(has & m, jnp.nan, aw)
        a_or_inf = jnp.where(has, a, jnp.inf)
        angles_acc = angles_acc + jnp.where(
            lane_r == k, jnp.broadcast_to(a_or_inf, (bb, _LANES)), F32(0))
        return angles_acc, cnt + has.astype(I32)

    angles_acc, cnt = jax.lax.fori_loop(
        0, rings, body,
        (jnp.zeros((bb, _LANES), F32), jnp.zeros((bb, 1), I32)))
    angles_ref[...] = angles_acc
    cnt_ref[...] = jnp.broadcast_to(cnt, (bb, _LANES))


def _discover_kernel_wide(params_ref, alpha_ref, angles_ref, cnt_ref, work,
                          *, rings: int):
    """One-SCAN-per-block variant of _discover_kernel for point counts
    whose (8, n) two-scan-buffer footprint exceeds scoped VMEM (262k-pt
    multi-LiDAR rigs): the scan's n points are spread row-major over 8
    sublane rows of n/8 lanes, so the greedy's "first unmatched point in
    input order" becomes the minimum masked ROW-MAJOR index over the
    whole block and the match/NaN-overwrite runs block-wide.  Semantics
    identical to _discover_kernel per scan (pinned in
    tests/test_pallas_interpret.py)."""
    tol = params_ref[0, 0]
    work[...] = alpha_ref[...]
    rows, m = work.shape
    idx = (jax.lax.broadcasted_iota(I32, (rows, m), 0) * I32(m)
           + jax.lax.broadcasted_iota(I32, (rows, m), 1))
    lane_r = jax.lax.broadcasted_iota(I32, (rows, _LANES), 1)
    big = I32(rows * m)

    def body(k, st):
        angles_acc, cnt = st
        aw = work[...]
        unm = ~jnp.isnan(aw)
        # Global first unmatched point: (rows, 1) per-row minima, then a
        # cross-sublane min — kept as a (1, 1) block (Mosaic forbids
        # scalar VMEM stores; (1,1) vectors broadcast fine).
        per_row = jnp.min(jnp.where(unm, idx, big), axis=1, keepdims=True)
        first = jnp.min(per_row, axis=0, keepdims=True)  # (1, 1)
        has = first < big  # (1, 1)
        a = jnp.sum(jnp.where(idx == first, aw, F32(0)),
                    keepdims=True)  # (1, 1); where is a SELECT (NaN-safe)
        m_tol = jnp.abs(aw - a) <= tol  # NaN lanes stay false
        work[...] = jnp.where(has & m_tol, jnp.nan, aw)
        a_or_inf = jnp.where(has, a, jnp.inf)
        angles_acc = angles_acc + jnp.where(
            lane_r == k, jnp.broadcast_to(a_or_inf, (rows, _LANES)), F32(0))
        return angles_acc, cnt + has.astype(I32)

    angles_acc, cnt = jax.lax.fori_loop(
        0, rings, body,
        (jnp.zeros((rows, _LANES), F32), jnp.zeros((1, 1), I32)))
    angles_ref[...] = angles_acc
    cnt_ref[...] = jnp.broadcast_to(cnt, (rows, _LANES))


def discover_rings_pallas(alpha_masked, interval, rings: int, *,
                          interpret: bool = False, wide=None):
    """Greedy ring registration on the NaN-masked vertical angle, batched:
    returns (ascending ring angles (B, rings), ring count (B,)) — the
    batch form of ops.geometry.discover_rings on (alpha, valid) with
    valid == ~isnan.  The ascending sort of the <=64 discovered angles
    (a (B, rings) lane sort) stays in XLA like the reference's ring-angle
    sort (lidar_segmentation.cpp:205)."""
    b, n = alpha_masked.shape
    assert rings <= _LANES, "ring cap exceeds one lane row"
    bb = min(_BB, b)
    if b % bb:
        bb = math.gcd(b, bb)
    # VMEM residency: the alpha input block AND the NaN-scratch copy are
    # both (bb, n) f32 and must be co-resident, so bb=8 at n=262144 is
    # 16.78 MB — 8 KB OVER the 16 MB scoped-VMEM limit (Mosaic stack OOM,
    # observed on the 262k multi-LiDAR bench).  Halving bb below 8 does
    # NOT help: Mosaic pads the sublane dim to the 8-row f32 tile, so a
    # (4, 262144) block still allocates 16.05 MB (device probe) — and a
    # bb=4 block with b > 4 fails to lower outright (sublane block dims
    # must be divisible by 8 or equal to the array dim).  Such rigs
    # switch to the one-scan-per-block WIDE kernel instead.  The 131k
    # production path stays at bb=8 (same cached graph as before).
    if wide is None:
        wide = 2 * max(bb, 8) * n * 4 > 12 * 2**20
    params = jnp.asarray(interval, F32).reshape(1, 1)
    if wide:
        rows = 8
        assert n % (rows * _LANES) == 0, (
            f"wide ring discovery needs n % {rows * _LANES} == 0, got {n}")
        m = n // rows
        angles, cnt = pl.pallas_call(
            functools.partial(_discover_kernel_wide, rings=rings),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      pl.BlockSpec((rows, m), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=(pl.BlockSpec((rows, _LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((rows, _LANES), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((b * rows, _LANES), F32),
                       jax.ShapeDtypeStruct((b * rows, _LANES), I32)),
            scratch_shapes=[pltpu.VMEM((rows, m), F32)],
            interpret=interpret,
        )(params, alpha_masked.reshape(b * rows, m))
        # Every row of a scan's 8-row output block is identical.
        return (jnp.sort(angles[::rows, :rings], axis=-1),
                cnt[::rows, 0])
    angles, cnt = pl.pallas_call(
        functools.partial(_discover_kernel, rings=rings),
        grid=(b // bb,),
        in_specs=[pl.BlockSpec((1, 1), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((bb, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((bb, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((bb, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, _LANES), F32),
                   jax.ShapeDtypeStruct((b, _LANES), I32)),
        scratch_shapes=[pltpu.VMEM((bb, n), F32)],
        interpret=interpret,
    )(params, alpha_masked)
    return jnp.sort(angles[:, :rings], axis=-1), cnt[:, 0]


# ---------------------------------------------------------------------------
# Kernel C: first-matching-ring assignment against the discovered table.
# ---------------------------------------------------------------------------


def _assign_kernel(params_ref, angles_ref, alpha_ref, ring_ref, *,
                   rings: int):
    tol = params_ref[0, 0]
    alpha = alpha_ref[...]
    angles = angles_ref[...].astype(F32)  # (bb, 128): per-SCAN ring tables
    lane = jax.lax.broadcasted_iota(I32, angles.shape, 1)
    ring = jnp.zeros(alpha.shape, I32)
    found = jnp.zeros(alpha.shape, jnp.bool_)
    # First match in ascending-angle order (lidar_segmentation.cpp:
    # 226-233), unrolled over the static ring cap.  Each scan (sublane)
    # has its own table: ring k's angle is extracted as a (bb, 1) column
    # by a one-hot where+reduce (the repo's measured-fastest select; a
    # lane-offset slice cannot broadcast across lanes on Mosaic —
    # CLAUDE.md) and broadcast against that scan's alpha row.  |NaN - a|
    # <= tol is false for every ring, so masked (non-ROI) points fall
    # through to ring id `rings` (= dropped) without a validity stream;
    # +inf table padding likewise never matches a finite alpha.
    for k in range(rings):
        a_k = jnp.sum(jnp.where(lane == k, angles, F32(0)), axis=1,
                      keepdims=True)  # (bb, 1); where is a SELECT, so a
        # +inf table entry survives the masked sum exact (inf + 0s).
        m = jnp.abs(alpha - a_k) <= tol
        ring = jnp.where(m & ~found, I32(k), ring)
        found = found | m
    ring_ref[...] = jnp.where(found, ring, I32(rings))


def assign_rings_pallas(alpha_masked, angles_sorted, interval, *,
                        interpret: bool = False, cols: int = _COLS):
    """Ring id per point from the NaN-masked vertical angle, batched.

    ``alpha_masked``: (B, N) f32, NaN at non-ROI points (the caller fuses
    the mask into the XLA transcendental pass).  ``angles_sorted``:
    (B, rings) ascending ring tables from ops.geometry.discover_rings
    (+inf padding).  Bit-equal to ops.geometry.assign_rings per scan.
    """
    b, n = alpha_masked.shape
    rings = int(angles_sorted.shape[-1])
    assert rings <= _LANES, "ring cap exceeds one lane row"
    _check_cols_env(cols)
    bb, cols, n_b, n_n = _grid_dims(b, n, cols)

    # (B, 128) table, +inf-padded: one VMEM lane row per scan (|alpha -
    # inf| <= tol is false for every finite alpha, like the XLA path's
    # padded-entry compares).
    angles_p = jnp.full((b, _LANES), jnp.inf, F32).at[:, :rings].set(
        angles_sorted)

    params = jnp.asarray(interval, F32).reshape(1, 1)
    spec = pl.BlockSpec((bb, cols), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    ring = pl.pallas_call(
        functools.partial(_assign_kernel, rings=rings),
        grid=(n_b, n_n),
        in_specs=[pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((bb, _LANES), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
                  spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((b, n), I32),
        interpret=interpret,
    )(params, angles_p, alpha_masked)
    return ring
