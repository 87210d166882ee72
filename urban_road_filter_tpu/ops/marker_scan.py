"""Sequential Pallas marker kernel: one streaming pass over the sorted
layout computes all four per-bin marker quantities at once.

The XLA path (ops/markers.py) evaluates FOUR dense (R, P, B) compare-reduce
cubes — each rebuilds the same `bin_of == b` broadcast compare, ~10 ms/step
at batch 16 (device trace r2).  This kernel exploits that TPU grids execute
in order: iterating (ring, slot-block) in exactly the reference's scan
order (arc-major, azimuth-minor, lidar_segmentation.cpp:295-351) turns the
whole stage into ONLINE per-bin running state, the same way the C++ updates
its marker arrays point by point:

    red[b]   |= saw a non-road point in bin b            (f in markers.py)
    cand      = road & in-bin & no prior non-road in b & d > 0
    maxd[b], winner coords: strict-> update, first-in-scan-order on ties

One (8, 512)-padded VMEM scratch row-block carries {f_g, maxd, gstar, x, y,
z} across grid steps; each block touches each compare exactly once.
Bit-equality with the XLA path is pinned by tests/test_pallas_interpret.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from urban_road_filter_tpu.constants import LABEL_ROAD
from urban_road_filter_tpu.ops.geometry import RingLayout

F32 = jnp.float32
I32 = jnp.int32

N_BINS = 361  # i = 0..360 inclusive (lidar_segmentation.cpp:305)
_BPAD = 512  # lane-padded bin axis
_BIG = 3.0e38  # sentinel > any g or d (g <= R*P < 2^24: f32-exact); plain
# Python float: a jnp scalar here would be a captured constant, which
# pallas_call rejects.


def _marker_kernel(counts_ref, nring_ref, x_ref, y_ref, z_ref, alpha_ref,
                   label_ref, out_ref, state, *, p: int, blocks_per_ring: int,
                   _BLK: int):
    step = pl.program_id(0)
    ring = step // blocks_per_ring
    blk = step % blocks_per_ring

    @pl.when(step == 0)
    def _():
        # Row layout: 0 f (min g of a non-road point, _BIG = none yet),
        # 1 maxd (0: the strict-> update never fires on empty bins),
        # 2 gstar, 3 x, 4 y, 5 z, 6-7 unused padding.
        state[...] = jnp.zeros((8, _BPAD), F32)
        state[0, :] = jnp.full((_BPAD,), _BIG, F32)

    slot0 = blk * _BLK
    slot = slot0 + jax.lax.broadcasted_iota(I32, (1, _BLK), 1)  # (1, BLK)
    valid = (slot < counts_ref[0, ring]) & (ring < nring_ref[0, 0])

    alpha = alpha_ref[0]  # (1, BLK)
    x = x_ref[0]
    y = y_ref[0]
    z = z_ref[0]
    label = label_ref[0]

    a_ok = valid & (alpha >= 0) & (alpha <= F32(360.0))  # NaN compares false
    g = (ring * p + slot).astype(F32)  # scan position, f32-exact (< 2^24)
    d = jnp.sqrt(x * x + y * y)
    road = label == LABEL_ROAD

    # Masks folded into f32 sentinels BEFORE the lane->sublane reshape:
    # Mosaic only relayouts 32-bit types (bool minor-dim inserts fail to
    # compile).  binf = -1 encodes "not a marker point" (no bin matches).
    binf = jnp.where(a_ok, jnp.floor(alpha), F32(-1.0))  # (1, BLK) f32
    nrf = jnp.where(road, F32(0), F32(1))  # non-road indicator
    candf = jnp.where(road & (d > 0), F32(1), F32(0))

    bcol = binf.reshape(_BLK, 1)
    gcol = g.reshape(_BLK, 1)
    bins = jax.lax.broadcasted_iota(I32, (_BLK, _BPAD), 1).astype(F32)
    in_bin = bcol == bins  # (BLK, BPAD)

    f_run = state[0, :]  # (BPAD,)
    # Non-road first-positions inside this block.
    nr = in_bin & (nrf.reshape(_BLK, 1) == 1)
    f_loc = jnp.min(jnp.where(nr, gcol, _BIG), axis=0)
    f_new = jnp.minimum(f_run, f_loc)

    # Road candidates: before ANY non-road g (running or in-block), d > 0.
    cand = (in_bin & (candf.reshape(_BLK, 1) == 1)
            & (gcol < f_new[None, :]))
    d_cand = jnp.where(cand, d.reshape(_BLK, 1), F32(0))
    maxd_loc = jnp.max(d_cand, axis=0)  # (BPAD,)

    maxd_run = state[1, :]
    better = maxd_loc > maxd_run  # strict: earlier winners keep ties

    # Winner inside the block: first scan position attaining maxd_loc.
    att = cand & (d_cand == maxd_loc[None, :])
    gstar_loc = jnp.min(jnp.where(att, gcol, _BIG), axis=0)
    mine = att & (gcol == gstar_loc[None, :])

    def pick(v):
        return jnp.sum(jnp.where(mine, v.reshape(_BLK, 1), F32(0)), axis=0)

    state[0, :] = f_new
    state[1, :] = jnp.where(better, maxd_loc, maxd_run)
    state[2, :] = jnp.where(better, gstar_loc, state[2, :])
    state[3, :] = jnp.where(better, pick(x), state[3, :])
    state[4, :] = jnp.where(better, pick(y), state[4, :])
    state[5, :] = jnp.where(better, pick(z), state[5, :])

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_ref[...] = state[...]


def marker_points_pallas(layout: RingLayout, num_rings, interpret: bool = False):
    """Dense (361, 6) marker table [exists, x, y, z, red, bin] from the
    azimuth-sorted layout — matches ops.markers.marker_points exactly."""
    r, p = layout.alpha.shape
    blk_w = min(512, p)  # slots per grid step
    assert p % blk_w == 0, (r, p)
    blocks_per_ring = p // blk_w

    counts = layout.counts.astype(I32).reshape(1, r)
    nring = jnp.full((1, 1), num_rings, I32)

    def blk3(a):  # (R, P) -> (R*blocks, 1, BLK) block rows
        return a.reshape(r * blocks_per_ring, 1, blk_w)

    out = pl.pallas_call(
        functools.partial(_marker_kernel, p=p,
                          blocks_per_ring=blocks_per_ring, _BLK=blk_w),
        grid=(r * blocks_per_ring,),
        in_specs=[
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # counts
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # num_rings
        ] + [pl.BlockSpec((1, 1, blk_w), lambda i: (i, 0, 0))] * 5,
        out_specs=pl.BlockSpec((8, _BPAD), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, _BPAD), F32),
        scratch_shapes=[pltpu.VMEM((8, _BPAD), F32)],
        interpret=interpret,
    )(counts, nring, blk3(layout.x), blk3(layout.y), blk3(layout.z),
      blk3(layout.alpha), blk3(layout.label.astype(F32)))

    f_g = out[0, :N_BINS]
    maxd = out[1, :N_BINS]
    px, py, pz = out[3, :N_BINS], out[4, :N_BINS], out[5, :N_BINS]
    exists = maxd > 0
    red = (f_g < _BIG).astype(F32)
    bins = jnp.arange(N_BINS, dtype=F32)
    return jnp.stack([exists.astype(F32), px, py, pz, red, bins], axis=1)
