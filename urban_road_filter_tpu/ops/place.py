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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
I32 = jnp.int32

_C = 1024  # points per grid step


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _place_kernel(active_ref, ids_ref, pos_ref, vals_ref, out_ref, *,
                  n_groups_pad: int, col_w: int, cols_per_super: int,
                  n_fields: int, limb_counts: tuple):
    # `active_ref` lives in SMEM (not scalar-prefetch: jax's vmap batching
    # rule for PrefetchScalarGridSpec falls back to INTERPRET mode, which
    # cost the batched pipeline ~14 ms/step as an XLA while-loop emulation —
    # device-trace r2).  A data-dependent pl.when on an SMEM scalar lowers
    # to a Mosaic scf.if and keeps the column-panel skipping.
    #
    # Grid layout: (super-panel, chunk).  The column-panel loop runs INSIDE
    # the kernel — a (cols, chunks) grid paid ~8x the per-step fixed cost
    # (block DMA issue + grid bookkeeping) on steps whose body was skipped,
    # which dominated the kernel at full batch (90 ms/step at b128,
    # device-trace r2 step 13).
    super_ = pl.program_id(0)
    step = pl.program_id(1)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    col0 = super_ * cols_per_super
    act_any = active_ref[col0, step]
    for j in range(1, cols_per_super):
        act_any += active_ref[col0 + j, step]

    # Column-panel skipping: LiDAR points arrive in firing (azimuth-major)
    # order, so a _C-point chunk advances every ring's write head by only
    # a few slots — each chunk touches ~1 of the capacity/col_w output
    # panels.  The host side precomputes which (col, chunk) pairs receive
    # any point; the rest skip the A-build and the MXU product entirely.
    @pl.when(act_any > 0)
    def _():
        ids = ids_ref[0]  # (1, C)
        pos = pos_ref[0]  # (1, C)
        vals = vals_ref[0]  # (n_fields, C)

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
            @pl.when(active_ref[col0 + j, step] > 0)
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


def _rank_place_kernel(ids_ref, vals_ref, out_ref, pos_ref, counts_ref,
                       running, *, n_groups_pad: int, num_groups: int,
                       col_w: int, n_cols: int, n_fields: int,
                       limb_counts: tuple, chunk: int):
    """Fused ranking + placement (round 3): the separate rank kernel cost
    25.3 ms/step at b128 (device trace r2) recomputing the same group
    one-hot this kernel already builds for the MXU product.  Here each
    chunk computes its points' slots inline:

      * per 128-lane tile, the within-tile same-group exclusive count is
        an MXU pairwise product S = oh_t^T @ oh_t (counts <= 128: bf16
        exact) masked lower-triangular — no (rows, L, L') VPU compare cube;
      * tile-to-tile and chunk-to-chunk carries ride a (G, 1) running
        counter in VMEM scratch (TPU grids run in order);
      * the active-panel test becomes a min/max range check on the chunk's
        computed slots (replacing the host-precomputed SMEM map).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)
        running[...] = jnp.zeros_like(running)

    bf = jnp.bfloat16
    ids = ids_ref[0]  # (1, C)
    gid = jax.lax.broadcasted_iota(I32, (n_groups_pad, 1), 0)
    oh = gid == ids  # (G, C) bool; rows only for REAL groups (g < G)

    # --- ranking: pos = running[g] + tile bases + within-tile count ---
    n_tiles = chunk // 128
    carry = running[...].astype(F32)  # (G, 1); counts < 2^24: f32-exact
    lt = jax.lax.broadcasted_iota(I32, (128, 128), 0) < \
        jax.lax.broadcasted_iota(I32, (128, 128), 1)  # j < i (strict)
    pos_tiles = []
    for t in range(n_tiles):
        oh_t = oh[:, t * 128:(t + 1) * 128]  # (G, 128)
        # Base for this tile = group counts before it (carry), selected
        # per point through the one-hot (sublane reduce).
        own_base = jnp.sum(jnp.where(oh_t, jnp.broadcast_to(
            carry, oh_t.shape), F32(0)), axis=0, keepdims=True)  # (1, 128)
        oh_tb = oh_t.astype(bf)
        s_pair = jax.lax.dot_general(  # (128, 128): same-group pairs
            oh_tb, oh_tb, (((0,), (0,)), ((), ())),
            preferred_element_type=F32)
        within = jnp.sum(jnp.where(lt, s_pair, F32(0)), axis=0,
                         keepdims=True)  # (1, 128) exclusive count
        pos_tiles.append(own_base + within)
        carry = carry + jnp.sum(oh_t, axis=1, keepdims=True).astype(F32)
    running[...] = carry.astype(I32)
    pos_f = jnp.concatenate(pos_tiles, axis=1)  # (1, C) f32, integral
    pos = pos_f.astype(I32)
    pos_ref[0] = pos

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        counts_ref[...] = carry.astype(I32).T  # (1, G)

    # --- placement: identical math to _place_kernel ---
    vals = vals_ref[0]  # (n_fields, C)
    lands = ids < I32(num_groups)
    pmn = jnp.min(jnp.where(lands, pos, I32(1 << 30)))
    pmx = jnp.max(jnp.where(lands, pos, I32(-1)))

    hi = vals.astype(bf)
    r1 = vals - hi.astype(F32)
    mid = r1.astype(bf)
    lo = (r1 - mid.astype(F32)).astype(bf)
    rows = []
    for f, nl in enumerate(limb_counts):
        rows.append(hi[f:f + 1])
        if nl >= 2:
            rows.append(mid[f:f + 1])
        if nl >= 3:
            rows.append(lo[f:f + 1])
    limbs = jnp.concatenate(rows, axis=0)  # (sum(limb_counts), C) bf16
    ring_oh = oh.astype(bf)
    a = (limbs[:, None, :] * ring_oh[None, :, :]).reshape(
        sum(limb_counts) * n_groups_pad, chunk)

    # Active-panel range check on the COMPUTED slots: conservative (panel
    # gaps activate too) but firing-order chunks span ~1 panel anyway.
    for j in range(n_cols):
        @pl.when((pmn < (j + 1) * col_w) & (pmx >= j * col_w))
        def _(j=j):
            sid = j * col_w + jax.lax.broadcasted_iota(
                I32, (col_w, chunk), 0)
            pos_oh_t = (sid == pos).astype(bf)  # (col_w, C)
            r = jax.lax.dot_general(a, pos_oh_t, (((1,), (1,)), ((), ())),
                                    preferred_element_type=F32)
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


def group_rank_place_pallas(ids, fields, num_groups: int, capacity: int,
                            limb_counts=None, interpret: bool = False):
    """Fused group_positions + group_place_pallas: one pass assigns each
    point its stable within-group slot AND places all fields.

    Returns (outs, pos, counts) — outs like group_place_pallas, pos (N,)
    i32 slots, counts (num_groups,) i32 totals — or None when the resident
    output would exceed the VMEM budget (caller falls back to the split
    kernels).  Values of points with ids >= num_groups must already be
    zeroed by the caller if they can be non-finite."""
    n = ids.shape[0]
    nf = len(fields)
    limb_counts = tuple(limb_counts or (3,) * nf)
    g_pad = _round_up(num_groups, 8)
    n_pad = _round_up(n, _C)
    col_w = min(capacity, 128)
    cap_pad = _round_up(capacity, col_w)
    n_cols = cap_pad // col_w
    if nf * g_pad * cap_pad * 4 > (6 << 20):
        return None  # resident output too large; use rank + place

    def prep_row(a, fill, dtype):
        return jnp.full((n_pad,), fill, dtype).at[:n].set(
            a.astype(dtype)).reshape(n_pad // _C, 1, _C)

    ids2 = prep_row(ids, I32(num_groups), I32)  # pad tail -> no group
    ok = ids < I32(num_groups)
    vals2 = jnp.stack([jnp.full((n_pad,), 0.0, F32).at[:n].set(
        jnp.where(ok, f.astype(F32), F32(0))) for f in fields], axis=0)
    vals2 = vals2.reshape(nf, n_pad // _C, _C).transpose(1, 0, 2)

    n_chunks = n_pad // _C
    out, pos, counts = pl.pallas_call(
        functools.partial(_rank_place_kernel, n_groups_pad=g_pad,
                          num_groups=num_groups, col_w=col_w, n_cols=n_cols,
                          n_fields=nf, limb_counts=limb_counts, chunk=_C),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, _C), lambda i: (i, 0, 0)),  # ids
            pl.BlockSpec((1, nf, _C), lambda i: (i, 0, 0)),  # values
        ],
        out_specs=(pl.BlockSpec((nf * g_pad, cap_pad), lambda i: (0, 0)),
                   pl.BlockSpec((1, 1, _C), lambda i: (i, 0, 0)),
                   pl.BlockSpec((1, g_pad), lambda i: (0, 0))),
        out_shape=(jax.ShapeDtypeStruct((nf * g_pad, cap_pad), F32),
                   jax.ShapeDtypeStruct((n_chunks, 1, _C), I32),
                   jax.ShapeDtypeStruct((1, g_pad), I32)),
        scratch_shapes=[pltpu.VMEM((g_pad, 1), I32)],
        interpret=interpret,
    )(ids2, vals2)
    outs = [out[f * g_pad:f * g_pad + num_groups, :capacity]
            for f in range(nf)]
    return outs, pos.reshape(-1)[:n], counts[0, :num_groups]


def group_place_pallas(ids, pos, fields, num_groups: int, capacity: int,
                       limb_counts=None, interpret: bool = False):
    """fields: list of (N,) arrays (cast to f32; exact for int32 |v|<2^24).
    limb_counts: per-field bf16 limb count (1 suffices for values needing
    <=8 mantissa bits, e.g. small label enums; default 3 = full f32).
    Values of non-landing points (dropped group / over-capacity) are zeroed
    internally; values of LANDING points must be finite (a landing NaN/Inf
    would poison its whole group row through the one-hot product — the
    pipeline guarantees this because roi_mask drops non-finite coordinates).
    Returns list of (num_groups, capacity) f32 arrays."""
    n = ids.shape[0]
    nf = len(fields)
    limb_counts = tuple(limb_counts or (3,) * nf)
    g_pad = _round_up(num_groups, 8)
    n_pad = _round_up(n, _C)
    pad_id = I32(g_pad)  # out-of-range group -> contributes nowhere

    def prep_row(a, fill, dtype):
        return jnp.full((n_pad,), fill, dtype).at[:n].set(
            a.astype(dtype)).reshape(n_pad // _C, 1, _C)

    ids2 = prep_row(ids, pad_id, I32)
    pos2 = prep_row(pos, I32(capacity), I32)
    # Points that land nowhere (dropped group / over-capacity) contribute via
    # a zero one-hot row — but a non-finite VALUE would still poison the
    # whole product (NaN * 0 == NaN inside jnp.dot).  Real PCD clouds contain
    # NaN returns, so zero the values of every non-landing point.
    lands = (ids < I32(num_groups)) & (pos < I32(capacity))
    vals2 = jnp.stack([jnp.full((n_pad,), 0.0, F32).at[:n].set(
        jnp.where(lands, f.astype(F32), F32(0))) for f in fields],
        axis=0)  # (F, n_pad)
    vals2 = vals2.reshape(nf, n_pad // _C, _C).transpose(1, 0, 2)  # (S, F, C)

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
    pos_chunks = pos2.reshape(n_pad // _C, _C)
    active = jnp.any(
        (pos_chunks // col_w)[None, :, :] ==
        jnp.arange(n_cols, dtype=I32)[:, None, None], axis=2).astype(I32)

    n_chunks = n_pad // _C
    out = pl.pallas_call(
        functools.partial(_place_kernel, n_groups_pad=g_pad, col_w=col_w,
                          cols_per_super=cols_per_super, n_fields=nf,
                          limb_counts=limb_counts),
        grid=(n_super, n_chunks),
        in_specs=[
            pl.BlockSpec((n_cols, n_chunks), lambda s, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, _C), lambda s, i: (i, 0, 0)),
            pl.BlockSpec((1, 1, _C), lambda s, i: (i, 0, 0)),
            pl.BlockSpec((1, nf, _C), lambda s, i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((nf * g_pad, super_w), lambda s, i: (0, s)),
        out_shape=jax.ShapeDtypeStruct((nf * g_pad, n_super * super_w), F32),
        interpret=interpret,
    )(active, ids2, pos2, vals2)
    return [out[f * g_pad:f * g_pad + num_groups, :capacity]
            for f in range(nf)]
