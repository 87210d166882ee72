"""MXU matmul placement: grouped scatter as one-hot matrix products.

`group_place(ids, pos, fields, num_groups, capacity)` materializes the
padded (num_groups, capacity) layout for several fields at once:

    out_f[r, s] = sum_i  field_f[i] * [ids_i == r] * [pos_i == s]

Each (r, s) receives at most one point (ids/pos come from ops.rank), so the
"sum" is pure selection and the result is exact.  XLA's TPU element-scatter
moves ~0.6 GB/s (device-trace measured, PERF.md); this kernel instead
streams input chunks through VMEM and accumulates ring_onehot @ (val *
pos_onehot) MXU products into a VMEM-resident output — HBM sees each input
element once and each output element once.

Falls back to the unique-indices XLA scatter on non-TPU backends.
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

_C = 2048  # points per grid step (tools/bench_place.py TPU sweep, b128:
# 1024 -> 143.4, 2048 -> 91.4, 4096 -> 90.3 ms/step isolated — the grid's
# fixed per-step cost dominates below 2048; 4096's extra 1% is not worth
# doubling the A-tile VMEM, which the 128-ring SP wedges also pay)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _place_kernel(active_ref, ids_ref, pos_ref, vals_ref, out_ref, *,
                  n_groups_pad: int, col_w: int, cols_per_super: int,
                  n_fields: int, limb_counts: tuple, chunks_per_step: int,
                  byte_limbs: bool = False, drop_occ: bool = False):
    # `active_ref` lives in SMEM (not scalar-prefetch: jax's vmap batching
    # rule for PrefetchScalarGridSpec falls back to INTERPRET mode, which
    # cost the batched pipeline ~14 ms/step as an XLA while-loop emulation —
    # device-trace r2).  A data-dependent pl.when on an SMEM scalar lowers
    # to a Mosaic scf.if and keeps the column-panel skipping.
    #
    # Grid layout: (super-panel, chunk-group).  The column-panel loop runs
    # INSIDE the kernel — a (cols, chunks) grid paid ~8x the per-step fixed
    # cost (block DMA issue + grid bookkeeping) on steps whose body was
    # skipped, which dominated the kernel at full batch (90 ms/step at
    # b128, device-trace r2 step 13).  chunks_per_step chunks ride one grid
    # step for the same reason (the fixed per-step cost was still the
    # dominant term at one 2048-point chunk per step, PERF.md round 4).
    super_ = pl.program_id(0)
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    col0 = super_ * cols_per_super
    chunk_fn = _place_chunk_i8 if byte_limbs else _place_chunk
    kw = {"drop_occ": drop_occ} if byte_limbs else {}
    for c in range(chunks_per_step):
        chunk_fn(active_ref, ids_ref, pos_ref, vals_ref, out_ref,
                 step * chunks_per_step + c, c, col0,
                 n_groups_pad=n_groups_pad, col_w=col_w,
                 cols_per_super=cols_per_super,
                 limb_counts=limb_counts, **kw)


def _place_chunk(active_ref, ids_ref, pos_ref, vals_ref, out_ref, chunk_i,
                 c, col0, *, n_groups_pad: int, col_w: int,
                 cols_per_super: int, limb_counts: tuple):
    act_any = active_ref[col0, chunk_i]
    for j in range(1, cols_per_super):
        act_any += active_ref[col0 + j, chunk_i]

    # Column-panel skipping: LiDAR points arrive in firing (azimuth-major)
    # order, so a _C-point chunk advances every ring's write head by only
    # a few slots — each chunk touches ~1 of the capacity/col_w output
    # panels.  The host side precomputes which (col, chunk) pairs receive
    # any point; the rest skip the A-build and the MXU product entirely.
    @pl.when(act_any > 0)
    def _():
        ids = ids_ref[c]  # (1, C)
        pos = pos_ref[c]  # (1, C)
        vals = vals_ref[c]  # (n_fields, C)

        # The MXU's default f32 path truncates operands to one bf16 pass,
        # which would mangle value mantissas (and Mosaic supports no HIGH
        # precision).  Decompose each value into bf16-exact limbs (8
        # mantissa bits each; 3 limbs cover full f32, small-range fields
        # declare fewer): limb x exact {0,1} one-hot products accumulated
        # in f32 reconstruct the value bit-exactly — placement is
        # selection, never true accumulation.  All limb rows ride ONE
        # matmul (M-stacked); the caller sums its row groups.
        bf = jnp.bfloat16
        hi = vals.astype(bf)
        r1 = vals - hi.astype(F32)
        mid = r1.astype(bf)
        lo = (r1 - mid.astype(F32)).astype(bf)  # <= 8 significant bits left
        rows = []
        for f, nl in enumerate(limb_counts):
            rows.append(hi[f:f + 1])
            if nl >= 2:
                rows.append(mid[f:f + 1])
            if nl >= 3:
                rows.append(lo[f:f + 1])
        limbs = jnp.concatenate(rows, axis=0)  # (sum(limb_counts), C) bf16

        gid = jax.lax.broadcasted_iota(I32, (n_groups_pad, 1), 0)
        ring_oh = (gid == ids).astype(bf)  # (G, C)
        a = (limbs[:, None, :] * ring_oh[None, :, :]).reshape(
            sum(limb_counts) * n_groups_pad, ids.shape[1])

        for j in range(cols_per_super):
            @pl.when(active_ref[col0 + j, chunk_i] > 0)
            def _(j=j):
                # This panel owns output columns [(col0+j)*col_w, +col_w).
                # One-hot built TRANSPOSED (col_w on sublanes) so `pos`
                # never leaves the lane axis — the (C, 1) reshape it
                # replaces was a per-panel lane->sublane relayout.
                sid = (col0 + j) * col_w + jax.lax.broadcasted_iota(
                    I32, (col_w, pos.shape[1]), 0)
                pos_oh_t = (sid == pos).astype(bf)  # (col_w, C)

                # bf16 x bf16 -> f32 runs the MXU at full rate and is EXACT
                # here: every a entry is a bf16 limb times a {0,1} one-hot,
                # every pos_oh entry is {0,1}, and each output element
                # receives at most one nonzero product.  Contract the C
                # axes (lhs dim 1, rhs dim 1).
                r = jax.lax.dot_general(a, pos_oh_t, (((1,), (1,)), ((), ())),
                                        preferred_element_type=F32)

                # Sum each field's limb rows here in VMEM (exact
                # reconstruction: at most one point lands per output
                # element, so hi+mid+lo are three disjoint-exponent parts
                # of one f32 value).  Doing this in-kernel shrinks the
                # output 3x and removes a measured ~6.9 ms/step XLA repack
                # fusion.
                parts = []
                row = 0
                for nl in limb_counts:
                    t = r[row * n_groups_pad:(row + 1) * n_groups_pad]
                    for k in range(1, nl):
                        t = t + r[(row + k) * n_groups_pad:
                                  (row + k + 1) * n_groups_pad]
                    parts.append(t)
                    row += nl
                out_ref[:, j * col_w:(j + 1) * col_w] += jnp.concatenate(
                    parts, axis=0)


def _place_chunk_i8(active_ref, ids_ref, pos_ref, vals_ref, out_ref, chunk_i,
                    c, col0, *, n_groups_pad: int, col_w: int,
                    cols_per_super: int, limb_counts: tuple,
                    drop_occ: bool = False):
    """Byte-limb (s8 MXU) variant of _place_chunk: each f32 value is split
    into its 4 raw i32 bytes; the A tile stores (byte - 128) * ring_onehot
    in s8 (i32 arithmetic, then one i32->i8 convert — Mosaic's elementwise
    i8 mul and i1->i8 select retile are both illegal, tools/
    probe_i8_place.py).  The -128 offset is undone using the slot
    OCCUPANCY.  Two modes:

    * drop_occ=False: a shared occupancy row-block rides the dot (it must
      be PER-CHUNK occupancy — each active chunk's panel body adds its
      correction — so it cannot come from global per-group counts), the
      +128*occ correction and the byte->f32 bitcast happen per chunk, and
      out_ref accumulates f32.
    * drop_occ=True (round 5, callers with dense ranked placement): the
      occupancy row-block is dropped from the A tile and the dot (1 of
      4*nf+1 row-blocks of MXU volume), out_ref accumulates the RAW
      offset i32 assembly `value_bits - 0x80808080*occ (mod 2^32)` —
      non-landing chunks contribute exactly 0 — and the wrapper applies
      the global `+0x80808080 * (slot < counts[g])` correction ONCE,
      XLA-side, then bitcasts.

    Exact for EVERY f32 bit pattern (placement is selection; the i32
    reconstruct is bitwise).  ~1.4x less A-tile traffic than the
    3x-bf16-limb tile and a 2x MXU rate; `limb_counts` is ignored (bytes
    are uniform)."""
    del limb_counts
    g_pad = n_groups_pad
    act_any = active_ref[col0, chunk_i]
    for j in range(1, cols_per_super):
        act_any += active_ref[col0 + j, chunk_i]

    @pl.when(act_any > 0)
    def _():
        ids = ids_ref[c]  # (1, C)
        pos = pos_ref[c]  # (1, C)
        vals = vals_ref[c]  # (n_fields, C) f32
        nf, cw = vals.shape

        vi = jax.lax.bitcast_convert_type(vals, I32)  # (nf, C)
        gid = jax.lax.broadcasted_iota(I32, (g_pad, 1), 0)
        ring_oh = (gid == ids).astype(I32)  # (G, C)

        rows = []
        for f in range(nf):
            for k in range(4):
                b = jax.lax.shift_right_logical(
                    vi[f:f + 1], I32(8 * k)) & I32(0xFF)  # (1, C) in 0..255
                rows.append(((b - I32(128)) * ring_oh).astype(I8))  # (G, C)
        if not drop_occ:
            rows.append(ring_oh.astype(I8))  # occupancy rides the dot
        a = jnp.concatenate(rows, axis=0)  # ((4*nf+{0,1})*G, C) s8

        for j in range(cols_per_super):
            @pl.when(active_ref[col0 + j, chunk_i] > 0)
            def _(j=j):
                sid = (col0 + j) * col_w + jax.lax.broadcasted_iota(
                    I32, (col_w, pos.shape[1]), 0)
                pos_oh_t = ((sid == pos).astype(I32)).astype(I8)  # (W, C)

                r = jax.lax.dot_general(a, pos_oh_t,
                                        (((1,), (1,)), ((), ())),
                                        preferred_element_type=I32)
                if drop_occ:
                    # Raw offset assembly: per byte-block k the dot gives
                    # (b_k - 128) for THIS chunk's landing point, 0
                    # otherwise; sums (not ORs — blocks are signed) to
                    # value_bits - 0x80808080 (mod 2^32, i32 wrap) once
                    # accumulated over all chunks.  Correction + bitcast
                    # happen XLA-side in the wrapper.
                    parts = []
                    for f in range(nf):
                        def blk(k, f=f):
                            return r[(4 * f + k) * g_pad:
                                     (4 * f + k + 1) * g_pad]
                        parts.append(
                            blk(0) + jax.lax.shift_left(blk(1), I32(8))
                            + jax.lax.shift_left(blk(2), I32(16))
                            + jax.lax.shift_left(blk(3), I32(24)))
                else:
                    occ_blk = r[4 * nf * g_pad:
                                (4 * nf + 1) * g_pad]  # (G, W)
                    parts = []
                    for f in range(nf):
                        def blk(k, f=f):
                            t = r[(4 * f + k) * g_pad:
                                  (4 * f + k + 1) * g_pad]
                            return t + I32(128) * occ_blk  # undo offset
                        oi = (blk(0) | jax.lax.shift_left(blk(1), I32(8))
                              | jax.lax.shift_left(blk(2), I32(16))
                              | jax.lax.shift_left(blk(3), I32(24)))
                        parts.append(jax.lax.bitcast_convert_type(oi, F32))
                out_ref[:, j * col_w:(j + 1) * col_w] += jnp.concatenate(
                    parts, axis=0)


def group_place_pallas(ids, pos, fields, num_groups: int, capacity: int,
                       limb_counts=None, interpret: bool = False,
                       chunk: int = _C, chunks_per_step: int = 2,
                       byte_limbs: bool = False, counts=None):
    """fields: list of (N,) arrays (cast to f32; exact for int32 |v|<2^24).
    limb_counts: per-field bf16 limb count (1 suffices for values needing
    <=8 mantissa bits, e.g. small label enums; default 3 = full f32).
    byte_limbs: use the s8-MXU byte-limb kernel instead of bf16 limbs
    (exact for every f32 bit pattern; requires num_groups padded to a
    multiple of 32 for i8 sublane tiling — the 64/128-ring layouts
    qualify; limb_counts is ignored).
    counts: optional (num_groups,) i32 — points landing per group, i.e.
    min(total per group, capacity).  byte_limbs only, and REQUIRES dense
    ranked placement (each group occupies exactly slots 0..counts[g]-1,
    as group_positions produces): the kernel then drops the shared
    occupancy row-block from the A tile and the dot (1 of 4*nf+1
    row-blocks of MXU volume) plus the per-panel +128*occ adds and
    bitcasts, accumulating raw offset i32; the global correction
    `+0x80808080 * (slot < counts[g])` is applied ONCE here, XLA-side
    (round-5 roofline attack on the place stage).
    Values of non-landing points (dropped group / over-capacity) are zeroed
    internally; values of LANDING points must be finite (a landing NaN/Inf
    would poison its whole group row through the one-hot product — the
    pipeline guarantees this because roi_mask drops non-finite coordinates).
    Returns list of (num_groups, capacity) f32 arrays."""
    n = ids.shape[0]
    nf = len(fields)
    limb_counts = tuple(limb_counts or (3,) * nf)
    # i8 sublane tiles are 32 rows: the byte-limb A-tile concatenates
    # g_pad-row blocks, which must land on tile boundaries.
    g_pad = _round_up(num_groups, 32 if byte_limbs else 8)
    n_pad = _round_up(n, chunk)
    pad_id = I32(g_pad)  # out-of-range group -> contributes nowhere

    def prep_row(a, fill, dtype):
        return jnp.full((n_pad,), fill, dtype).at[:n].set(
            a.astype(dtype)).reshape(n_pad // chunk, 1, chunk)

    ids2 = prep_row(ids, pad_id, I32)
    pos2 = prep_row(pos, I32(capacity), I32)
    # Points that land nowhere (dropped group / over-capacity) contribute via
    # a zero one-hot row — but a non-finite VALUE would still poison the
    # whole product (NaN * 0 == NaN inside jnp.dot).  Real PCD clouds contain
    # NaN returns, so zero the values of every non-landing point.
    lands = (ids < I32(num_groups)) & (pos < I32(capacity))
    # (byte_limbs history: a first i8 attempt failed round 3 on Mosaic's
    # elementwise-i8-mul and i1->i8-select-retile gaps; the round-4 kernel
    # routes around both — i32 arithmetic then ONE i32->i8 convert — and
    # measures 59.6 vs 142.7 ms/step isolated at b128.  See PERF.md.)
    vals2 = jnp.stack([jnp.full((n_pad,), 0.0, F32).at[:n].set(
        jnp.where(lands, f.astype(F32), F32(0))) for f in fields],
        axis=0)  # (F, n_pad)
    vals2 = vals2.reshape(nf, n_pad // chunk, chunk).transpose(1, 0, 2)

    # Narrow (128-wide) column panels bound the MXU MACs per active pair
    # (firing-order chunks advance each ring's write head by only a few
    # slots, so halving the panel width halves the MACs while the straddle
    # rate grows only slightly).  Panels are walked INSIDE the kernel; the
    # grid's column axis only splits the output into VMEM-sized
    # super-panels (one super-panel for the default 64x2048 layout).
    # Capacities that are not panel multiples are padded up (the padded
    # slots receive nothing: `lands` uses the true capacity) and sliced
    # back below — a 192-slot layout must not silently truncate.
    col_w = min(capacity, 128)
    cap_pad = _round_up(capacity, col_w)
    n_cols = cap_pad // col_w
    # Super-panel = as many panels as keep the resident out block <= ~4 MB,
    # constrained to divide n_cols so panel indices never leave the map.
    cols_per_super = next(
        c for c in range(n_cols, 0, -1)
        if n_cols % c == 0 and c * col_w * nf * g_pad * 4 <= (4 << 20))
    super_w = cols_per_super * col_w
    n_super = n_cols // cols_per_super
    # Which (col panel, chunk) pairs receive any point (firing-order scans
    # touch ~1 panel per chunk; skipped pairs cost no VPU/MXU work).
    pos_chunks = pos2.reshape(n_pad // chunk, chunk)
    active = jnp.any(
        (pos_chunks // col_w)[None, :, :] ==
        jnp.arange(n_cols, dtype=I32)[:, None, None], axis=2).astype(I32)

    n_chunks = n_pad // chunk
    cs = math.gcd(n_chunks, chunks_per_step)
    use_counts = byte_limbs and counts is not None
    out = pl.pallas_call(
        functools.partial(_place_kernel, n_groups_pad=g_pad, col_w=col_w,
                          cols_per_super=cols_per_super, n_fields=nf,
                          limb_counts=limb_counts, chunks_per_step=cs,
                          byte_limbs=byte_limbs, drop_occ=use_counts),
        grid=(n_super, n_chunks // cs),
        in_specs=[
            pl.BlockSpec((n_cols, n_chunks), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((cs, 1, chunk), lambda s, i: (i, 0, 0)),
            pl.BlockSpec((cs, 1, chunk), lambda s, i: (i, 0, 0)),
            pl.BlockSpec((cs, nf, chunk), lambda s, i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nf * g_pad, super_w), lambda s, i: (0, s)),
        out_shape=jax.ShapeDtypeStruct((nf * g_pad, n_super * super_w),
                                       I32 if use_counts else F32),
        interpret=interpret,
    )(active, ids2, pos2, vals2)
    if use_counts:
        # Undo the -128 byte offsets once per OCCUPIED slot: dense ranked
        # placement means slot s of group g is occupied iff s < counts[g].
        # 0x80808080 == 128*(1 + 2^8 + 2^16 + 2^24); i32 add wraps mod
        # 2^32, matching the kernel's raw assembly.  One (G, cap)
        # elementwise pass, fused by XLA into the consumer.
        occ = (jax.lax.broadcasted_iota(I32, (num_groups, capacity), 1)
               < counts.astype(I32)[:, None])
        corr = jnp.where(occ, I32(-2139062144), I32(0))  # 0x80808080
        return [jax.lax.bitcast_convert_type(
            out[f * g_pad:f * g_pad + num_groups, :capacity] + corr, F32)
            for f in range(nf)]
    return [out[f * g_pad:f * g_pad + num_groups, :capacity]
            for f in range(nf)]
