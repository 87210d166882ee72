"""Star-shaped roadside search (reference: star_shaped_search.cpp:32-181).

TPU re-derivation: the reference walks each of 360 radial beams outward,
maintaining a running mean and absolute-average-deviation of the (r, z)
slope and marking the first point whose slope exceeds a constant OR an
adaptive threshold, then breaking (cpp:111-151).

The sequential recurrence is exactly a pair of prefix sums:
    avg_i = (sum of valid slopes <= i) / m_i,          m_i = # valid slopes
    dev_i = (sum_j<=i |slp_j - avg_j|) / m_i           (each term uses avg at
                                                        its own step j)
so the whole walk vectorizes as cumsum + first-true argmax per beam —
no lax.scan, no sequential dependence (SURVEY.md section 7, hard part #1).
NaN slopes (coincident radii) are excluded from the stats but still
evaluated against the thresholds, as in the C++ (cpp:131-141).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import LABEL_CURB, STAR_KFI, STAR_REP, beam_tables

F32 = jnp.float32
I32 = jnp.int32


def star_shaped(pts: jax.Array, valid: jax.Array, labels: jax.Array,
                cfg: FilterConfig, beam_capacity: int):
    """Returns (updated per-point labels, overflow count): marks LABEL_CURB
    at beam edges; overflow counts points dropped by beam capacity (the
    reference keeps all points per beam — a nonzero count means the radial
    walk saw a truncated beam and capacity should be raised)."""
    n = pts.shape[0]
    k_cap = beam_capacity
    x, y, z = pts[:, 0], pts[:, 1], pts[:, 2]

    # --- polar binning (cpp:162-174): f32 r, fi; truncating sector index ---
    r = jnp.sqrt(x * x + y * y)
    fi = jnp.arctan2(y, x)
    fi = jnp.where(fi < 0, fi + F32(2.0 * math.pi), fi)
    # f == rep IS reachable (fi a few ulps below 2pi rounds to 360.0 after
    # the f32 multiply); the reference routes it to beam 0 via its
    # beamp[rep] sentinel pointer (star_shaped_search.cpp:20,157).
    f = (fi * F32(STAR_KFI)).astype(I32) % I32(STAR_REP)

    keep = valid
    if cfg.starbeam_filter:
        # Rectangle filter (cpp:73-107), applied pointwise before grouping.
        yx_t, d_t, o_t = beam_tables()
        yx_b = jnp.asarray(yx_t)[f]
        d_b = jnp.asarray(d_t)[f]
        o_b = jnp.asarray(o_t)[f]
        c = d_b * jnp.where(yx_b, y, x)
        coord = jnp.where(yx_b, x, y)
        keep = keep & ((c - o_b) < coord) & (coord < (c + o_b))

    # --- stable grouping into (REP, K): beams accumulate in input order.
    # Sort-free: per-beam slot = exclusive running count of same-beam
    # predecessors, computed by the sequential-grid Pallas ranking kernel
    # (a 131k-element multi-operand bitonic sort costs ~100 GB of HBM
    # traffic; the ranking kernel reads/writes each point once).
    from urban_road_filter_tpu.ops.rank import group_positions

    iota = jnp.arange(n, dtype=I32)
    fk = jnp.where(keep, f, I32(STAR_REP))
    pos, counts_all = group_positions(fk, STAR_REP + 1)

    # Matmul placement is a measured loss here (113.6 vs 118.4 scans/s):
    # 360 groups exceed the VMEM A-tile in one pass, and group-panelled
    # calls re-stream all N inputs per panel.  The unique-indices scatter
    # stays (see PERF.md).
    fits = (fk < STAR_REP) & (pos < k_cap)
    dst = jnp.where(fits, fk * I32(k_cap) + pos,
                    I32(STAR_REP * k_cap) + iota)

    def scatter(vals, fill, dtype):
        buf = jnp.full((STAR_REP * k_cap + n,), fill, dtype)
        return buf.at[dst].set(vals.astype(dtype), unique_indices=True)[
            :STAR_REP * k_cap].reshape(STAR_REP, k_cap)

    r_b = scatter(r, jnp.inf, F32)
    z_b = scatter(z, 0.0, F32)
    pid_b = scatter(iota, -1, I32)
    counts = jnp.minimum(counts_all[:STAR_REP], k_cap)

    # --- per-beam radial sort (cpp:109); stable, invalid slots at +inf ---
    slot = jnp.arange(k_cap)[None, :]
    sort_key = jnp.where(slot < counts[:, None], r_b, jnp.inf)
    _, r_s, z_s, pid_s = jax.lax.sort(
        (sort_key, r_b, z_b, pid_b), dimension=1, num_keys=1, is_stable=True)

    # --- edge detection as prefix statistics (cpp:111-151) ---
    import numpy as np

    # f32(angleFilter3_f32 * (M_PI/180)): f64 product of the f32 parameter,
    # rounded to f32 (star_shaped_search.cpp:160) — computed at trace time.
    slope_param = F32(float(np.float32(cfg.curb_slope_deg)) * (math.pi / 180.0))
    kdev = F32(cfg.kdev_param)
    kdist = F32(cfg.kdist_param)
    dmin = int(cfg.dmin_param)

    dr = r_s - jnp.roll(r_s, 1, axis=1)  # bx - ax at step i
    dz = z_s - jnp.roll(z_s, 1, axis=1)
    slp = dz / dr
    i_idx = slot  # walk index i == sorted slot index
    in_walk = (i_idx >= 1) & (i_idx <= counts[:, None] - 1)

    vstat = in_walk & ~jnp.isnan(slp)  # NaN slopes skip the stats update
    m = jnp.cumsum(vstat.astype(F32), axis=1)
    sum_slp = jnp.cumsum(jnp.where(vstat, slp, F32(0)), axis=1)
    avg = jnp.where(m > 0, sum_slp / m, F32(0))
    sum_dev = jnp.cumsum(jnp.where(vstat, jnp.abs(slp - avg), F32(0)), axis=1)
    dev = jnp.where(m > 0, sum_dev / m, F32(0))

    adaptive = (i_idx > dmin) & ((slp * slp - avg * avg) * kdev * (dr * kdist) > dev)
    trigger = in_walk & ((slp > slope_param) | adaptive)

    hit = jnp.any(trigger, axis=1)
    first = jnp.argmax(trigger, axis=1)
    hit_pid = pid_s[jnp.arange(STAR_REP), first]

    marks = jnp.zeros((n + 1,), jnp.bool_).at[jnp.where(hit, hit_pid, n)].set(True)[:n]
    overflow = jnp.sum((fk < STAR_REP) & (pos >= k_cap)).astype(I32)
    return jnp.where(marks, LABEL_CURB, labels), overflow
