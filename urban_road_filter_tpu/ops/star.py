"""Star-shaped roadside search (reference: star_shaped_search.cpp:32-181).

TPU re-derivation #2 (round 2).  The reference walks each of 360 radial
beams outward, maintaining a running mean and absolute-average-deviation of
the (r, z) slope and marking the first point whose slope exceeds a constant
OR an adaptive threshold, then breaking (cpp:111-151).

Round-1 design scattered points into a (360, capacity) beam layout (3
XLA element-scatters at ~0.6 GB/s + a per-beam sort) — device-trace measured
at ~3.5 ms/scan, the single largest pipeline cost.  This version instead:

  1. ONE stable 2-key `lax.sort` over (beam, radius) with z/pid payloads —
     the whole scan becomes beam-contiguous, radially ordered segments;
  2. the running mean/AAD walk becomes SEGMENTED prefix sums
     (`lax.associative_scan` with a reset flag at each beam boundary —
     resets also contain the C++'s per-beam inf/NaN slope poisoning inside
     its beam, which a global cumsum would leak across beams);
  3. the "first trigger then break" is a segmented first-true;
  4. the <=360 hits return to point order through one dense (n, 360)
     compare-reduce plus a 360-element scatter.

No beam capacity exists anymore: like the reference, every point of a beam
participates in the walk (round 1 truncated at `beam_capacity` and counted
overflow; the parameter is now ignored and overflow is always 0).

The incremental C++ recurrence avg_i = (avg_{i-1}(m-1) + slp)/m telescopes
to sum/m exactly (up to f32 reassociation, same class of divergence as the
round-1 cumsum design, measured by the parity suite).  NaN slopes
(coincident radii) skip the stats update but still face the thresholds,
as in the C++ (cpp:131-141).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB, STAR_KFI, STAR_REP, beam_tables

F32 = jnp.float32
I32 = jnp.int32


def _starbeam_rect(x, y, f):
    """Rectangle filter membership (cpp:73-107), pointwise on sector f."""
    yx_t, d_t, o_t = beam_tables()
    yx_b = jnp.asarray(yx_t)[f]
    d_b = jnp.asarray(d_t)[f]
    o_b = jnp.asarray(o_t)[f]
    c = d_b * jnp.where(yx_b, y, x)
    coord = jnp.where(yx_b, x, y)
    return ((c - o_b) < coord) & (coord < (c + o_b))


def _segmented_cumsums(first, vals):
    """Inclusive per-segment prefix sums: resets where `first` is True.
    vals: tuple of (n,) arrays.  Returns the scanned tuple."""

    def comb(a, b):
        fa, va = a[0], a[1:]
        fb, vb = b[0], b[1:]
        return (fa | fb,) + tuple(jnp.where(fb, y, x + y)
                                  for x, y in zip(va, vb))

    out = jax.lax.associative_scan(comb, (first,) + tuple(vals))
    return out[1:]


def star_shaped(pts: jax.Array, valid: jax.Array, labels: jax.Array,
                cfg: FilterConfig, beam_capacity: int = 0):
    """Returns (updated per-point labels, overflow count).  Marks LABEL_CURB
    at beam edges.  `beam_capacity` is accepted for API compatibility and
    ignored (every point participates, like the reference); overflow is
    always 0."""
    from urban_road_filter_tpu.ops.geometry import xyz_of

    del beam_capacity
    n = xyz_of(pts)[3]
    hp, overflow = star_hits(pts, valid, cfg)
    hit = hp > 0
    marks = jnp.zeros((n + 1,), jnp.bool_).at[
        jnp.where(hit, hp - 1, n)].set(True)[:n]
    return jnp.where(marks, LABEL_CURB, labels), overflow


def _star_sort(fk, r_key, z, iota, n: int, packed: bool = False):
    """(beam, radius, input-order) sort of the 4 star streams: a 4-operand
    stable 2-key `lax.sort`.

    `packed=True` selects the round-4 experiment: (fk, r, pid) packed
    EXACTLY into two non-negative i32 keys (hi = fk<<22 | r_bits>>9,
    lo = (r_bits & 0x1ff)<<pb | pid, with r_bits = bitcast(r)
    order-isomorphic for the always-non-negative radii and pb =
    ceil(log2(n)) <= 22), cutting the network to 3 operands with
    bit-identical output (pinned by tests/test_ops_stages.py::
    test_packed_star_sort_bit_identical).  MEASURED SLOWER on TPU
    (tools/bench_sortvar.py v3: 580.9 vs 507.2 us/scan for the legacy
    sort) — operand count is NOT the sort's cost driver and the
    pack/unpack elementwise passes do not fuse into the sort's operand
    buffers; kept for the record (PERF.md round-4 dead ends)."""
    if not packed or 9 + max(1, (n - 1).bit_length()) > 31:
        return jax.lax.sort((fk, r_key, z, iota), dimension=0, num_keys=2,
                            is_stable=True)
    pb = max(1, (n - 1).bit_length())
    r_bits = jax.lax.bitcast_convert_type(r_key, I32)
    hi = (fk << I32(22)) | (r_bits >> I32(9))
    lo = ((r_bits & I32(0x1FF)) << I32(pb)) | iota
    hi_s, lo_s, z_s = jax.lax.sort((hi, lo, z), dimension=0, num_keys=2,
                                   is_stable=False)
    fk_s = hi_s >> I32(22)
    r_s = jax.lax.bitcast_convert_type(
        ((hi_s & I32(0x3FFFFF)) << I32(9)) | ((lo_s >> I32(pb)) & I32(0x1FF)),
        F32)
    pid_s = lo_s & I32((1 << pb) - 1)
    return fk_s, r_s, z_s, pid_s


def star_hits(pts: jax.Array, valid: jax.Array, cfg: FilterConfig,
              fk: jax.Array | None = None, r_key: jax.Array | None = None):
    """The star search's raw result: (hp, overflow) where hp is a (360,)
    int32 array with hp[b] = 1 + point index of beam b's first triggering
    point, or 0 when the beam found no edge.  At most one point per beam is
    ever marked (cpp:142-148 breaks after the first hit), so callers can
    scatter/label the <=360 hits directly instead of paying an n-element
    pass.

    ``fk``/``r_key`` accept the pre-sort keys computed by the fused ingest
    kernel (ops/ingest_scan.py, round 4): fk = sector or STAR_REP for
    non-ROI points, r_key = 2-D radius or +inf.  The starbeam rectangle
    refinement still happens here (table lookups stay XLA); dropped points
    keep fk == STAR_REP under the refinement since both where() branches
    agree there."""
    from urban_road_filter_tpu.ops.geometry import xyz_of

    x, y, z, n = xyz_of(pts)  # (N, 4) row-major or (3, N) planar

    if fk is None:
        # --- polar binning (cpp:162-174): f32 r, fi; truncating index ---
        r = jnp.sqrt(x * x + y * y)
        fi = jnp.arctan2(y, x)
        fi = jnp.where(fi < 0, fi + F32(2.0 * math.pi), fi)
        # f == rep IS reachable (fi a few ulps below 2pi rounds to 360.0
        # after the f32 multiply); the reference's beamp[360] stays null and
        # it would crash on such a point (PARITY.md item 5a) — routing
        # f==360 to beam 0 (the same sector, 0 == 360 degrees) is our fix
        # of the evident intent.
        f = (fi * F32(STAR_KFI)).astype(I32) % I32(STAR_REP)
        keep = valid
        if cfg.starbeam_filter:
            keep = keep & _starbeam_rect(x, y, f)
        fk = jnp.where(keep, f, I32(STAR_REP))  # dropped -> sink segment
        r_key = jnp.where(keep, r, jnp.inf)  # == r on every kept point
    elif cfg.starbeam_filter:
        # Refine the ingest-kernel keys: non-ROI points have fk == STAR_REP
        # already (both branches below preserve it); table index 0 for them
        # is arbitrary and masked.
        f = jnp.where(fk < I32(STAR_REP), fk, I32(0))
        rect = _starbeam_rect(x, y, f)
        fk = jnp.where(rect, fk, I32(STAR_REP))
        r_key = jnp.where(rect, r_key, jnp.inf)

    # --- ONE stable 2-key sort: beam-major, radius-minor, ties by input
    # order (the C++ std::sort is unstable on ties; we pin input order, same
    # as the oracle, oracle/reference.py:173) ---
    iota = jnp.arange(n, dtype=I32)
    fk_s, r_s, z_s, pid_s = _star_sort(fk, r_key, z, iota, n)

    # --- edge detection as segmented prefix statistics (cpp:111-151) ---
    # f32(angleFilter3_f32 * (M_PI/180)): f64 product of the f32 parameter,
    # rounded to f32 (star_shaped_search.cpp:160) — host-precomputed as
    # cfg.slope_param (config.py) so it stays exact when the thresholds
    # arrive as dynamic operands (no-retrace hot-swap).
    slope_param = jnp.asarray(cfg.slope_param, F32)
    kdev = jnp.asarray(cfg.kdev_param, F32)
    kdist = jnp.asarray(cfg.kdist_param, F32)
    dmin = jnp.asarray(cfg.dmin_param, I32)

    if jax.default_backend() in ("tpu", "axon"):
        # One sequential Pallas pass for every segmented recurrence AND the
        # per-beam hit table (the associative_scan lowering below costs
        # ~0.8 ms/scan in log-depth slice/pad chains; see ops/star_scan.py).
        # The kernel takes the 4 sorted streams directly and derives the
        # slopes/reset flags/walk masks in-kernel — the XLA prep below is
        # ~10 full-array HBM passes the TPU path no longer pays (round 4).
        from urban_road_filter_tpu.ops.star_scan import star_scan_pallas

        hp = star_scan_pallas(
            fk_s, r_s, z_s, pid_s,
            slope_param=slope_param, kdev=kdev,
            kdist=kdist, dmin=dmin, num_beams=STAR_REP)
        return hp, jnp.asarray(0, I32)

    first = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                             fk_s[1:] != fk_s[:-1]])
    in_beam = fk_s < STAR_REP
    wk = in_beam & ~first  # walk index i >= 1 within the beam

    dr = r_s - jnp.roll(r_s, 1)  # bx - ax at step i (garbage at seg starts,
    dz = z_s - jnp.roll(z_s, 1)  # masked by wk)
    slp = dz / dr
    vstat = wk & ~jnp.isnan(slp)  # NaN slopes skip the stats update

    rank, m, sum_slp = _segmented_cumsums(first, (
        jnp.ones((n,), I32), vstat.astype(F32),
        jnp.where(vstat, slp, F32(0))))
    i_idx = rank - 1  # 0 at the beam's innermost point, like the C++ walk
    avg = jnp.where(m > 0, sum_slp / m, F32(0))
    (sum_dev,) = _segmented_cumsums(
        first, (jnp.where(vstat, jnp.abs(slp - avg), F32(0)),))
    dev = jnp.where(m > 0, sum_dev / m, F32(0))

    adaptive = (i_idx > dmin) & ((slp * slp - avg * avg) * kdev * (dr * kdist) > dev)
    trigger = wk & ((slp > slope_param) | adaptive)

    # First trigger per beam ("mark then break", cpp:142-148).
    (trig_rank,) = _segmented_cumsums(first, (trigger.astype(I32),))
    first_trig = trigger & (trig_rank == 1)

    # <=360 hits -> per-beam pid via a dense compare-reduce (fused, never
    # materialized).
    bins = jnp.arange(STAR_REP, dtype=I32)
    hp = jnp.sum(jnp.where((fk_s[:, None] == bins[None, :])
                           & first_trig[:, None],
                           (pid_s + 1)[:, None], 0), axis=0)  # (360,)
    return hp, jnp.asarray(0, I32)
