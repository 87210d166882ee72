"""Device-side ingest & geometry prep (reference layer L2).

Re-derivation of lidar_segmentation.cpp:95-278 as dense tensor ops:
  * ROI crop -> boolean mask (no compaction; padding/missing returns are
    (0,0,0) and die on the x+y+z != 0 test exactly like real dropouts);
  * greedy ring discovery -> 64-iteration fori_loop of vector ops (an exact
    reformulation of the input-order greedy: ring k+1's representative is the
    first point matching none of rings 0..k, see oracle.discover_rings);
  * ring binning -> first-match against the ascending ring table;
  * tensorization -> stable scatter into a padded (rings, ring_capacity)
    layout preserving *input order* within each ring (the reference's x/z-zero
    stencils run before the azimuth sort, lidar_segmentation.cpp:280-291,
    so input order is semantically load-bearing).

All math is float32 (TPU-native); the reference mixes float storage with
double intermediates — divergence is <= 1 ulp at branch thresholds and is
measured, not hidden, by the parity tests.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.constants import CHANNELS

F32 = jnp.float32
I32 = jnp.int32


def roi_mask(pts: jax.Array, cfg: FilterConfig) -> jax.Array:
    """Crop box + zero-point drop (lidar_segmentation.cpp:106-117)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    return (
        (x >= F32(cfg.min_x)) & (x <= F32(cfg.max_x))
        & (y >= F32(cfg.min_y)) & (y <= F32(cfg.max_y))
        & (z >= F32(cfg.min_z)) & (z <= F32(cfg.max_z))
        & (x + y + z != F32(0))
    )


def vertical_angles(x: jax.Array, y: jax.Array, z: jax.Array):
    """3-D range + vertical angle in degrees (lidar_segmentation.cpp:145-166)."""
    d = jnp.sqrt(x * x + y * y + z * z)
    bracket = jnp.clip(jnp.abs(z) / d, F32(-1), F32(1))
    deg = F32(180.0 / math.pi)
    alpha = jnp.where(z < 0, jnp.arccos(bracket) * deg,
                      jnp.arcsin(bracket) * deg + F32(90))
    return d, alpha


def discover_rings(alpha: jax.Array, valid: jax.Array, interval: float):
    """Greedy ring registration (lidar_segmentation.cpp:168-197) as a
    64-step loop of vectorized matching.  Returns (ascending ring angles
    padded with +inf, ring count)."""
    tol = F32(interval)
    inf = jnp.array(jnp.inf, F32)

    def body(k, st):
        angles, matched, count = st
        unmatched = valid & ~matched
        has = jnp.any(unmatched)
        first = jnp.argmax(unmatched)  # lowest index with True
        a = alpha[first]
        angles = angles.at[k].set(jnp.where(has, a, inf))
        matched = matched | (has & (jnp.abs(alpha - a) <= tol))
        return angles, matched, count + has.astype(I32)

    angles0 = jnp.full((CHANNELS,), jnp.inf, F32)
    angles, _, count = jax.lax.fori_loop(
        0, CHANNELS, body, (angles0, jnp.zeros_like(valid), jnp.asarray(0, I32)))
    return jnp.sort(angles), count


def assign_rings(alpha: jax.Array, valid: jax.Array, angles_sorted: jax.Array,
                 interval: float) -> jax.Array:
    """First matching ring in ascending-angle order
    (lidar_segmentation.cpp:226-233); CHANNELS = dropped."""
    m = jnp.abs(angles_sorted[None, :] - alpha[:, None]) <= F32(interval)
    has = jnp.any(m, axis=1)
    ring = jnp.argmax(m, axis=1).astype(I32)
    return jnp.where(valid & has, ring, I32(CHANNELS))


def azimuth_2d(x: jax.Array, y: jax.Array):
    """2-D radius + [0,360] azimuth, quadrant cases
    (lidar_segmentation.cpp:244-269)."""
    d2 = jnp.sqrt(x * x + y * y)
    bracket = jnp.clip(jnp.abs(x) / d2, F32(-1), F32(1))
    asin_deg = jnp.arcsin(bracket) * F32(180.0 / math.pi)
    alpha = jnp.where(
        (x >= 0) & (y <= 0), asin_deg,
        jnp.where((x >= 0) & (y > 0), F32(180) - asin_deg,
                  jnp.where((x < 0) & (y >= 0), F32(180) + asin_deg,
                            F32(360) - asin_deg)))
    return d2, alpha


class RingLayout(NamedTuple):
    """Padded per-ring tensors, input order along the slot axis."""

    x: jax.Array  # (R, P) f32
    y: jax.Array
    z: jax.Array
    d2: jax.Array
    alpha: jax.Array  # 2-D azimuth, degrees
    label: jax.Array  # (R, P) int32
    pid: jax.Array  # (R, P) int32 original point index; -1 = empty slot
    counts: jax.Array  # (R,) int32 points per ring
    overflow: jax.Array  # scalar int32 — points dropped by capacity


def tensorize(x, y, z, d2, alpha, label, ring_id, ring_capacity: int) -> RingLayout:
    """Stable scatter into (CHANNELS, P); input order preserved per ring.

    Replaces the reference's per-scan `channels x piece` allocation
    (lidar_segmentation.cpp:207, ~300 MB/scan) with a fixed padded layout.
    TPU note: one multi-operand lax.sort carries all point fields through
    the grouping (payloads ride the sort network — no per-field gathers);
    per-ring counts are a one-hot compare-reduce, not a scatter-add.
    """
    from urban_road_filter_tpu.ops.rank import group_positions

    n = ring_id.shape[0]
    p = ring_capacity
    iota = jnp.arange(n, dtype=I32)

    # Slot of each point = # earlier points in the same ring — computed by
    # the sequential-grid Pallas ranking kernel (ops/rank.py): one read +
    # one write per point, vs ~100 GB of bitonic-sort traffic at 131k pts.
    pos, counts_all = group_positions(ring_id, CHANNELS + 1)

    in_ring = ring_id < CHANNELS
    counts = jnp.minimum(counts_all[:CHANNELS], p)
    overflow = jnp.sum(in_ring & (pos >= p)).astype(I32)

    if jax.default_backend() in ("tpu", "axon"):
        # MXU matmul placement (ops/place.py): XLA's element-scatter runs
        # ~0.6 GB/s on TPU; one-hot matmul accumulation into a VMEM-resident
        # layout places all five fields in a fraction of the time.  pid is
        # shifted by +1 so empty slots (0) decode to -1.
        from urban_road_filter_tpu.ops.place import group_place_pallas

        lx, ly, lz, llbl, lpid = group_place_pallas(
            ring_id, pos, [x, y, z, label, iota + 1], CHANNELS, p,
            limb_counts=(3, 3, 3, 1, 3))  # labels are {0,1,2}: 1 limb
        lbl_i = llbl.astype(I32)
        pid_i = lpid.astype(I32) - 1
    else:
        # Unique dump slots -> fast unique-indices scatter path.
        fits = in_ring & (pos < p)
        dst = jnp.where(fits, ring_id * I32(p) + pos, I32(CHANNELS * p) + iota)

        def scatter(vals, fill, dtype):
            buf = jnp.full((CHANNELS * p + n,), fill, dtype)
            buf = buf.at[dst].set(vals.astype(dtype), unique_indices=True)
            return buf[:CHANNELS * p].reshape(CHANNELS, p)

        lx, ly, lz = scatter(x, 0.0, F32), scatter(y, 0.0, F32), scatter(z, 0.0, F32)
        lbl_i = scatter(label, 0, I32)
        pid_i = scatter(iota, -1, I32)

    # d2/alpha are pure functions of (x, y): recompute them on the placed
    # layout instead of paying two more placements.  Padding slots (x=y=0)
    # get alpha=NaN, which every consumer already masks via counts/a_ok.
    del d2, alpha
    ld2, lalpha = azimuth_2d(lx, ly)
    return RingLayout(
        x=lx, y=ly, z=lz, d2=ld2, alpha=lalpha,
        label=lbl_i, pid=pid_i, counts=counts, overflow=overflow)


def max_distance(layout: RingLayout) -> jax.Array:
    """Per-ring max 2-D radius (lidar_segmentation.cpp:271-274); 0 if empty."""
    slot_valid = jnp.arange(layout.d2.shape[1])[None, :] < layout.counts[:, None]
    return jnp.max(jnp.where(slot_valid, layout.d2, F32(0)), axis=1)


def sort_by_azimuth(layout: RingLayout) -> RingLayout:
    """Per-ring stable sort by azimuth (replaces the recursive quicksort,
    lidar_segmentation.cpp:70-93,289-291; layout becomes sorted by
    construction for everything downstream)."""
    p = layout.alpha.shape[1]
    slot_valid = jnp.arange(p)[None, :] < layout.counts[:, None]
    # NaN azimuth (x=y=0 points): sorts after every finite azimuth but
    # *before* the +inf padding, so the first `counts` slots stay the valid
    # points (the reference's quicksort ordering of NaN is UB; we pin this).
    key = jnp.where(slot_valid,
                    jnp.where(jnp.isnan(layout.alpha), F32(1e30), layout.alpha),
                    jnp.inf)
    # One stable multi-operand sort per ring row: payloads ride the sort
    # network instead of 7 take_along_axis gathers (slow on TPU).
    _, xs, ys, zs, d2s, als, lbs, pids = jax.lax.sort(
        (key, layout.x, layout.y, layout.z, layout.d2, layout.alpha,
         layout.label, layout.pid), dimension=1, num_keys=1, is_stable=True)
    return layout._replace(x=xs, y=ys, z=zs, d2=d2s, alpha=als,
                           label=lbs, pid=pids)
