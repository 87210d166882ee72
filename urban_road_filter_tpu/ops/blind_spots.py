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
    road(point p on ring k) = EXISTS i: reach[k, i] & p in window_k(i)

TPU note: both existential quantifiers are evaluated as DENSE compare-
reduces over the (ring, slot, start) cube — ~100M fused VPU ops per scan —
rather than binary searches: gather-based searchsorted costs ~30x more on
TPU than streaming compares the VPU eats for free, and XLA fuses the
broadcast-compare into the reduction so the cube never materializes.

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
from urban_road_filter_tpu.constants import LABEL_CURB, LABEL_ROAD
from urban_road_filter_tpu.ops.geometry import RingLayout

F32 = jnp.float32
I32 = jnp.int32

_NI = 362  # start angles 0..361 (361 used; one pad for convenience)


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


def window_widths(max_dist: jax.Array, beam_zone) -> jax.Array:
    """Equal-arc-length window width per ring, degrees
    (blind_spots.cpp:65,142,251): w[0] = beamZone; w[k] = arcDistance /
    (maxDist_k * pi / 180); inf where a ring is empty (harmless: no points)."""
    bz = jnp.asarray(beam_zone, F32)  # may be a dynamic operand
    deg_len = max_dist * F32(math.pi) / F32(180)
    arc_distance = deg_len[0] * bz
    return (arc_distance / deg_len).at[0].set(bz)


def sweep_bounds(w: jax.Array, beam_zone, direction: int):
    """(active, lo, hi) for one sweep; lo/hi are the ACTUAL per-(ring, start)
    inclusive window bounds, exact-equality overrides applied."""
    bz = jnp.asarray(beam_zone, F32)  # may be a dynamic operand
    rings = w.shape[0]
    i_f = jnp.arange(_NI, dtype=F32)
    k_ge1 = jnp.arange(rings)[:, None] >= 1
    if direction > 0:
        active = i_f <= (F32(360) - bz)
        special = (i_f == (F32(360) - bz))[None, :] & k_ge1
        lo = jnp.broadcast_to(i_f, (rings, _NI))
        hi = jnp.where(special, F32(360), i_f[None, :] + w[:, None])
    else:
        active = (i_f >= bz) & (i_f <= F32(360))
        special = (i_f == bz)[None, :] & k_ge1
        hi = jnp.broadcast_to(i_f, (rings, _NI))
        lo = jnp.where(special, F32(0), i_f[None, :] - w[:, None])
    return active, lo, hi


def blocked_bits(alpha, curb, lo, hi):
    """blocked[k, i] = any curb point in [lo, hi] — dense compare-reduce.
    alpha/curb: (R, P); lo/hi: (R, NI).  NaN alphas never block (NaN
    compares false), matching the C++ walk stopping at NaN."""
    a = alpha[:, :, None]  # (R, P, 1)
    in_win = (a >= lo[:, None, :]) & (a <= hi[:, None, :])  # (R, P, NI), fused
    return jnp.any(in_win & curb[:, :, None], axis=1)  # (R, NI)


def labeled_mask(alpha, a_ok, reach, lo, hi):
    """labeled[k, p] = exists i: reach[k, i] & alpha in [lo, hi] — dense."""
    a = alpha[:, :, None]
    in_win = (a >= lo[:, None, :]) & (a <= hi[:, None, :])
    return jnp.any(in_win & reach[:, None, :], axis=2) & a_ok


def blind_spots(layout: RingLayout, max_dist: jax.Array, num_rings: jax.Array,
                cfg: FilterConfig, want_marker_f: bool = False):
    """Order-free: every window test compares a slot's own azimuth against
    per-(ring, start) bounds and every reduction is over slot sets, so the
    layout may be in raw tensorize order (round 2: the azimuth sort now
    feeds only the marker stage).  On TPU the two dense existential cubes
    run as window-skipping Pallas passes (ops/flood_scan.py, bit-equal).

    want_marker_f=True (TPU only) additionally returns the marker stage's
    per-bin non-road key state, computed inside the fused labeled pass
    (flood_scan.labeled_markerf_pallas): returns (layout, kf)."""
    alpha, label, counts = layout.alpha, layout.label, layout.counts
    p = alpha.shape[1]
    slot = jnp.arange(p)[None, :]
    slot_valid = slot < counts[:, None]
    ring_active = (jnp.arange(alpha.shape[0]) < num_rings)[:, None]

    gate = jnp.zeros((_NI,), jnp.bool_)
    if cfg.blind_spots:
        q = _quadrant_extremes(alpha[1], label[1], slot_valid[1])
        gate = _gate(jnp.arange(_NI, dtype=F32), q, int(cfg.x_direction))

    w = window_widths(max_dist, cfg.beam_zone)

    rings = alpha.shape[0]
    ring_iota = jnp.arange(rings, dtype=I32)

    def reach_of(blocked, direction: int):
        """reach[k, i] = no blocked ring <= k, start active, ring active.
        Computed as k < (first blocked ring) — a plain min-reduce; XLA's
        cumulative-op lowering of the equivalent cumprod cost ~9 ms/step
        at batch 128 (device trace r2)."""
        active, _, _ = sweep_bounds(w, cfg.beam_zone, direction)
        ok = active & ~gate
        first_blocked = jnp.min(
            jnp.where(blocked & ring_active, ring_iota[:, None], I32(rings)),
            axis=0)  # (NI,)
        return ((ring_iota[:, None] < first_blocked[None, :])
                & ok[None, :] & ring_active)

    kf = None
    if jax.default_backend() in ("tpu", "axon"):
        from urban_road_filter_tpu.ops.flood_scan import (
            blocked_pallas, labeled_markerf_pallas, labeled_pallas)

        blocked_f, blocked_b = blocked_pallas(layout, w, cfg.beam_zone)
        if want_marker_f:
            road, kf = labeled_markerf_pallas(
                layout, reach_of(blocked_f, +1), reach_of(blocked_b, -1),
                w, cfg.beam_zone)
        else:
            road = labeled_pallas(layout, reach_of(blocked_f, +1),
                                  reach_of(blocked_b, -1), w, cfg.beam_zone)
    else:
        curb = slot_valid & (label == LABEL_CURB)
        a_ok = (slot_valid & jnp.isfinite(alpha) & (alpha >= 0)
                & (alpha <= F32(360)))

        def sweep(direction: int):
            active, lo, hi = sweep_bounds(w, cfg.beam_zone, direction)
            blocked = blocked_bits(alpha, curb, lo, hi)
            reach = reach_of(blocked, direction)
            return labeled_mask(alpha, a_ok, reach, lo, hi)

        road = sweep(+1) | sweep(-1)
    new_label = jnp.where(road & (label != LABEL_CURB), LABEL_ROAD, label)
    out = layout._replace(label=new_label)
    if want_marker_f:
        return out, kf
    return out
