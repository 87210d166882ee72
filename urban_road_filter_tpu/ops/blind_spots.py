"""Blind-spot guard + road flood fill (reference: blind_spots.cpp:7-284).

Parallel re-derivation.  The reference runs two sequential sweeps over 361
integer start angles; for each start it walks rings outward with
equal-arc-length windows, labelling road until a curb blocks the beam.
Crucially the sweeps only *read* curb labels (2) and only *write* road
labels (1), and never create 2s — so every (start, ring) step depends
exclusively on the initial curb labels, both sweeps commute, and the whole
stage is a pure reachability computation (SURVEY.md section 7, hard part #2):

    blocked[k, i] = any curb on ring k within window_k(i)
    reach[k, i]   = active(i) & ~gate(i) & AND_{m<=k} ~blocked[m, i]
    road(point p on ring k, azimuth a) = EXISTS i: reach[k, i]
                                          & i inside p's window bounds

With per-ring window widths constant in i, the existential reduces to a
range query over a prefix sum of reach along i — O(R * 362) searchsorted +
cumsum work instead of the reference's O(360 * N) pointer chasing.

Float semantics follow the C++: integer starts compared in f32, window
bounds i +- w_k in f32, the `i == 360-beamZone` / `i == beamZone` exact-
equality special cases reproduced (including that they apply only to rings
k >= 1, blind_spots.cpp:136-143,244-251).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import CHANNELS, LABEL_CURB, LABEL_ROAD
from urban_road_filter_tpu.ops.geometry import RingLayout

F32 = jnp.float32
I32 = jnp.int32

_NI = 362  # start angles 0..361 (361 used; one pad for prefix convenience)


def _quadrant_extremes(alpha1, label1, valid1):
    """Extremal curb azimuths on arc #1 per quadrant (blind_spots.cpp:19-57).
    Strict >/< updates against the 0/180/180/360 inits are preserved."""
    curb = valid1 & (label1 == LABEL_CURB)
    a = alpha1
    neg, pos = F32(-jnp.inf), F32(jnp.inf)

    def mx(cond):
        return jnp.max(jnp.where(curb & cond, a, neg))

    def mn(cond):
        return jnp.min(jnp.where(curb & cond, a, pos))

    r1 = (a >= 0) & (a < 90)
    r2 = (a >= 90) & (a < 180)
    r3 = (a >= 180) & (a < 270)
    r4 = ~(r1 | r2 | r3) & ~jnp.isnan(a)
    q1 = jnp.where(mx(r1) > 0, mx(r1), F32(0))
    q2 = jnp.where(mn(r2) < 180, mn(r2), F32(180))
    q3 = jnp.where(mx(r3) > 180, mx(r3), F32(180))
    q4 = jnp.where(mn(r4) < 360, mn(r4), F32(360))
    return q1, q2, q3, q4


def _gate(i_f, q, x_direction: int):
    """Blind-spot angular gate per start angle (blind_spots.cpp:77-99)."""
    q1, q2, q3, q4 = q
    if x_direction == 0:
        return ((q1 != 0) & (q4 != 360) & ((i_f <= q1) | (i_f >= q4))) | (
            (q2 != 180) & (q3 != 180) & (i_f >= q2) & (i_f <= q3))
    if x_direction == 1:
        return ((q2 != 180) & (i_f >= q2) & (i_f <= 270)) | (
            (q1 != 0) & ((i_f <= q1) | (i_f >= 270)))
    return ((q4 != 360) & ((i_f >= q4) | (i_f <= 90))) | (
        (q3 != 180) & (i_f <= q3) & (i_f >= 90))


def blind_spots(layout: RingLayout, max_dist: jax.Array, num_rings: jax.Array,
                cfg: FilterConfig) -> RingLayout:
    """layout must be azimuth-sorted (geometry.sort_by_azimuth)."""
    alpha, label, counts = layout.alpha, layout.label, layout.counts
    p = alpha.shape[1]
    slot = jnp.arange(p)[None, :]
    slot_valid = slot < counts[:, None]
    ring_active = (jnp.arange(CHANNELS) < num_rings)[:, None]

    bz = F32(cfg.beam_zone)
    i_f = jnp.arange(_NI, dtype=F32)  # start angles as f32 (int-exact)

    gate = jnp.zeros((_NI,), jnp.bool_)
    if cfg.blind_spots:
        q = _quadrant_extremes(alpha[1], label[1], slot_valid[1])
        gate = _gate(i_f, q, int(cfg.x_direction))

    # Per-ring curb prefix counts along sorted azimuth.
    curb = (slot_valid & (label == LABEL_CURB)).astype(I32)
    cc = jnp.concatenate([jnp.zeros((CHANNELS, 1), I32),
                          jnp.cumsum(curb, axis=1)], axis=1)  # (R, P+1)

    # Window widths: w[0] = beamZone; w[k] = arcDistance / (maxDist_k*pi/180)
    # (blind_spots.cpp:65,142,251).
    deg_len = max_dist * F32(math.pi) / F32(180)  # arc length of 1 degree
    arc_distance = deg_len[0] * bz
    w = arc_distance / deg_len  # inf where ring empty (no points -> harmless)
    w = w.at[0].set(bz)

    def count_in(a_row, cc_row, lo_vec, hi_vec):
        l = jnp.searchsorted(a_row, lo_vec, side="left")
        r = jnp.searchsorted(a_row, hi_vec, side="right")
        return cc_row[r] - cc_row[l]

    v_count = jax.vmap(count_in)

    def sweep(direction: int):
        """direction +1 = forward (0 -> 360-bz), -1 = backward (360 -> bz)."""
        if direction > 0:
            active = i_f <= (F32(360) - bz)
            special = i_f == (F32(360) - bz)
            bounds = i_f[None, :] + w[:, None]          # un-overridden cd rows
            sp_bound = F32(360)
            lo = jnp.broadcast_to(i_f, (CHANNELS, _NI))
            hi = jnp.where((jnp.arange(CHANNELS)[:, None] >= 1) & special[None, :],
                           sp_bound, bounds)
        else:
            active = (i_f >= bz) & (i_f <= F32(360))  # loop starts at i = 360
            special = i_f == bz
            bounds = i_f[None, :] - w[:, None]
            sp_bound = F32(0)
            hi = jnp.broadcast_to(i_f, (CHANNELS, _NI))
            lo = jnp.where((jnp.arange(CHANNELS)[:, None] >= 1) & special[None, :],
                           sp_bound, bounds)

        blocked = v_count(alpha, cc, lo, hi) > 0
        ok = active & ~gate
        not_blocked = (~(blocked & ring_active)).astype(I32)
        reach = (jnp.cumprod(not_blocked, axis=0) > 0) & ok[None, :] & ring_active
        cnt = jnp.concatenate([jnp.zeros((CHANNELS, 1), I32),
                               jnp.cumsum(reach.astype(I32), axis=1)], axis=1)

        a = alpha
        a_ok = slot_valid & jnp.isfinite(a) & (a >= 0) & (a <= F32(360))
        if direction > 0:
            # labeled by i iff i <= a  AND  a <= bounds[k](i):
            # i in [ss(bounds_row, a, left), floor(a)]
            i_lo = jax.vmap(lambda b_row, a_row: jnp.searchsorted(b_row, a_row, side="left"))(bounds, a)
            i_hi = jnp.where(a_ok, jnp.clip(jnp.floor(a), 0, _NI - 1).astype(I32), I32(-1))
        else:
            # labeled by i iff i >= a  AND  bounds[k](i) <= a:
            # i in [ceil(a), ss(bounds_row, a, right)-1]
            i_lo = jnp.where(a_ok, jnp.clip(jnp.ceil(a), 0, _NI).astype(I32), I32(_NI))
            i_hi = jax.vmap(lambda b_row, a_row: jnp.searchsorted(b_row, a_row, side="right"))(bounds, a) - 1

        i_lo_c = jnp.clip(i_lo, 0, _NI)
        i_hi_c = jnp.clip(i_hi + 1, 0, _NI)
        labeled = (jnp.take_along_axis(cnt, i_hi_c, axis=1)
                   - jnp.take_along_axis(cnt, i_lo_c, axis=1)) > 0

        # Exact-equality special case: bound overridden to 360 (fwd) / 0 (bwd)
        # for rings k >= 1 only.
        has_sp = jnp.any(special)
        i_sp = jnp.argmax(special)
        reach_sp = reach[:, i_sp] & has_sp  # (R,)
        k_ge1 = jnp.arange(CHANNELS)[:, None] >= 1
        if direction > 0:
            in_sp = (a >= i_f[i_sp]) & (a <= F32(360))
        else:
            in_sp = (a <= i_f[i_sp]) & (a >= F32(0))
        labeled_sp = reach_sp[:, None] & k_ge1 & a_ok & in_sp

        return labeled | labeled_sp

    road = sweep(+1) | sweep(-1)
    new_label = jnp.where(road & slot_valid & (label != LABEL_CURB),
                          LABEL_ROAD, label)
    return layout._replace(label=new_label)
