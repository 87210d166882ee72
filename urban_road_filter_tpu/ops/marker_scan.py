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
