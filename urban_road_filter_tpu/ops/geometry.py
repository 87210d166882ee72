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


def xyz_of(pts: jax.Array):
    """(x, y, z, n) from either point orientation.

    Row-major ``(N, 4)`` (the pad_scan layout, matching the reference's
    point struct) or planar ``(3, N)`` (round 5: coordinate planes are
    TPU-lane-native (N,) streams — a (N, 4) device tensor pads its 4-wide
    minor dim to 128 lanes and the batch graph paid a ~2 ms/step relayout
    copy before every per-column read; planar inputs also skip staging
    the intensity column the device never reads).  Disambiguation is by
    the trailing dim: row-major always has exactly 4 columns."""
    if pts.ndim == 2 and pts.shape[-1] != 4:
        if pts.shape[0] != 3:
            raise ValueError(
                f"points must be (N, 4) row-major or (3, N) planar; got "
                f"{pts.shape}")
        return pts[0], pts[1], pts[2], pts.shape[1]
    return pts[:, 0], pts[:, 1], pts[:, 2], pts.shape[0]


def roi_mask_xyz(x: jax.Array, y: jax.Array, z: jax.Array,
                 cfg: FilterConfig) -> jax.Array:
    """Crop box + zero-point drop (lidar_segmentation.cpp:106-117)."""
    # jnp.asarray (not the F32 scalar-type constructor): the bounds may be
    # dynamic jit operands (config hot-swap without re-trace).
    s = lambda v: jnp.asarray(v, F32)
    return (
        (x >= s(cfg.min_x)) & (x <= s(cfg.max_x))
        & (y >= s(cfg.min_y)) & (y <= s(cfg.max_y))
        & (z >= s(cfg.min_z)) & (z <= s(cfg.max_z))
        & (x + y + z != F32(0))
    )


def roi_mask(pts: jax.Array, cfg: FilterConfig) -> jax.Array:
    """roi_mask_xyz over a (..., 4) row-major point tensor."""
    return roi_mask_xyz(pts[..., 0], pts[..., 1], pts[..., 2], cfg)


def vertical_angles(x: jax.Array, y: jax.Array, z: jax.Array):
    """3-D range + vertical angle in degrees (lidar_segmentation.cpp:145-166)."""
    d = jnp.sqrt(x * x + y * y + z * z)
    bracket = jnp.clip(jnp.abs(z) / d, F32(-1), F32(1))
    deg = F32(180.0 / math.pi)
    alpha = jnp.where(z < 0, jnp.arccos(bracket) * deg,
                      jnp.arcsin(bracket) * deg + F32(90))
    return d, alpha


def discover_rings(alpha: jax.Array, valid: jax.Array, interval: float,
                   rings: int = CHANNELS):
    """Greedy ring registration (lidar_segmentation.cpp:168-197) as a
    `rings`-step loop of vectorized matching.  Returns (ascending ring
    angles padded with +inf, ring count).  `rings` is the channel cap —
    the reference hardcodes 64 (lidar_segmentation.cpp:4); dims.rings lets
    128-channel sensors keep all their rings."""
    tol = jnp.asarray(interval, F32)  # may be a dynamic operand
    inf = jnp.array(jnp.inf, F32)

    def body(k, st):
        angles, matched, count = st
        unmatched = valid & ~matched
        first = jnp.argmax(unmatched)  # lowest index with True
        # `any` folded into the argmax result: argmax returns 0 when no
        # element is True, and unmatched[0] is then False — one 131k
        # reduce per iteration instead of two (device trace round 4).
        has = unmatched[first]
        a = alpha[first]
        angles = angles.at[k].set(jnp.where(has, a, inf))
        matched = matched | (has & (jnp.abs(alpha - a) <= tol))
        return angles, matched, count + has.astype(I32)

    angles0 = jnp.full((rings,), jnp.inf, F32)
    angles, _, count = jax.lax.fori_loop(
        0, rings, body, (angles0, jnp.zeros_like(valid), jnp.asarray(0, I32)))
    return jnp.sort(angles), count


def assign_rings(alpha: jax.Array, valid: jax.Array, angles_sorted: jax.Array,
                 interval: float) -> jax.Array:
    """First matching ring in ascending-angle order
    (lidar_segmentation.cpp:226-233); rings (= angles_sorted size) =
    dropped."""
    rings = angles_sorted.shape[0]
    m = jnp.abs(angles_sorted[None, :] - alpha[:, None]) <= jnp.asarray(interval, F32)
    has = jnp.any(m, axis=1)
    ring = jnp.argmax(m, axis=1).astype(I32)
    return jnp.where(valid & has, ring, I32(rings))


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


def tensorize(x, y, z, ring_id, ring_capacity: int, label=None,
              with_pid: bool = False, rings: int = CHANNELS):
    """Stable placement into (rings, P); input order preserved per ring.
    Returns (RingLayout, pos) where pos[i] is point i's slot within its
    ring — the (ring_id, pos) pair addresses the layout, so downstream
    per-point results come back by table-gather instead of scatter.

    Replaces the reference's per-scan `channels x piece` allocation
    (lidar_segmentation.cpp:207, ~300 MB/scan) with a fixed padded layout.
    Only x/y/z are placed by default (9 bf16 limb rows on the TPU matmul
    path); `label` (per-point initial labels, e.g. the SP path's carried
    star marks, +1 limb) and `with_pid` (+3 limbs) are opt-in — the
    single-device pipeline needs neither, and placement cost is
    proportional to limb rows.
    """
    from urban_road_filter_tpu.ops.rank import group_positions

    n = ring_id.shape[0]
    p = ring_capacity
    iota = jnp.arange(n, dtype=I32)

    fields = [x, y, z]
    limbs = [3, 3, 3]
    if label is not None:
        fields.append(label)
        limbs.append(1)  # labels are {0,1,2}: 1 limb
    if with_pid:
        fields.append(iota + 1)  # +1 so empty slots (0) decode to -1
        limbs.append(3)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    # (Round-3 dead end, measured: a FUSED rank+place kernel — in-kernel
    # slot assignment via per-tile pairwise MXU products feeding the
    # placement one-hot — ran ~48 ms/scan vs the split kernels' ~0.5:
    # the serial tile->carry chain of tiny (128x128x64) matmuls and
    # sublane reduces does not pipeline, and the rank cubes want a
    # (rows, lanes, G) orientation that cannot share the (G, C) placement
    # one-hot anyway.  See PERF.md.)

    # Slot of each point = # earlier points in the same ring — computed by
    # the sequential-grid Pallas ranking kernel (ops/rank.py): one read +
    # one write per point, vs ~100 GB of bitonic-sort traffic at 131k pts.
    pos, counts_all = group_positions(ring_id, rings + 1)

    in_ring = ring_id < rings
    counts = jnp.minimum(counts_all[:rings], p)
    overflow = jnp.sum(in_ring & (pos >= p)).astype(I32)

    if on_tpu:
        # MXU matmul placement (ops/place.py): XLA's element-scatter runs
        # ~0.6 GB/s on TPU; one-hot matmul accumulation into a VMEM-resident
        # layout places every field in a fraction of the time.
        from urban_road_filter_tpu.ops.place import group_place_pallas

        outs = group_place_pallas(ring_id, pos, fields, rings, p,
                                  limb_counts=tuple(limbs), byte_limbs=True,
                                  counts=counts)
        outs = [o.astype(I32) if i >= 3 else o for i, o in enumerate(outs)]
    else:
        # Unique dump slots -> fast unique-indices scatter path.
        fits = in_ring & (pos < p)
        dst = jnp.where(fits, ring_id * I32(p) + pos, I32(rings * p) + iota)

        def scatter(vals, fill, dtype):
            buf = jnp.full((rings * p + n,), fill, dtype)
            buf = buf.at[dst].set(vals.astype(dtype), unique_indices=True)
            return buf[:rings * p].reshape(rings, p)

        outs = [scatter(f, 0.0, F32) for f in fields[:3]]
        if label is not None:
            outs.append(scatter(label, 0, I32))
        if with_pid:
            outs.append(scatter(iota + 1, 0, I32))

    return _assemble_layout(outs, label, with_pid, rings, p, counts,
                            overflow), pos


def _assemble_layout(outs, label, with_pid: bool, rings: int, p: int,
                     counts, overflow) -> RingLayout:
    lx, ly, lz = outs[0], outs[1], outs[2]
    k = 3
    if label is not None:
        lbl_i = outs[k]
        k += 1
    else:
        lbl_i = jnp.zeros((rings, p), I32)
    pid_i = (outs[k] - 1) if with_pid else jnp.full((rings, p), -1, I32)

    # d2/alpha are pure functions of (x, y): recompute them on the placed
    # layout instead of paying two more placements.  Padding slots (x=y=0)
    # get alpha=NaN, which every consumer already masks via counts/a_ok.
    ld2, lalpha = azimuth_2d(lx, ly)
    return RingLayout(
        x=lx, y=ly, z=lz, d2=ld2, alpha=lalpha,
        label=lbl_i, pid=pid_i, counts=counts, overflow=overflow)


def max_distance(layout: RingLayout) -> jax.Array:
    """Per-ring max 2-D radius (lidar_segmentation.cpp:271-274); 0 if empty."""
    slot_valid = jnp.arange(layout.d2.shape[1])[None, :] < layout.counts[:, None]
    return jnp.max(jnp.where(slot_valid, layout.d2, F32(0)), axis=1)


def sort_by_azimuth(layout: RingLayout, carry_pid: bool = False) -> RingLayout:
    """Per-ring stable sort by azimuth (replaces the recursive quicksort,
    lidar_segmentation.cpp:70-93,289-291).  Round 2: only the marker stage
    consumes the sorted view (blind_spots is order-free), so the sort
    carries just (key, x, y, z, label); d2/alpha are recomputed from the
    sorted x/y (bit-identical — same pure function of the same values) and
    pid is not carried (-1; per-point labels come back by table-gather on
    the UNSORTED layout)."""
    p = layout.alpha.shape[1]
    slot_valid = jnp.arange(p)[None, :] < layout.counts[:, None]
    # NaN azimuth (x=y=0 points): sorts after every finite azimuth but
    # *before* the +inf padding, so the first `counts` slots stay the valid
    # points (the reference's quicksort ordering of NaN is UB; we pin this).
    key = jnp.where(slot_valid,
                    jnp.where(jnp.isnan(layout.alpha), F32(1e30), layout.alpha),
                    jnp.inf)
    # One stable multi-operand sort per ring row: payloads ride the sort
    # network instead of take_along_axis gathers (slow on TPU).
    ops = (key, layout.x, layout.y, layout.z, layout.label) + (
        (layout.pid,) if carry_pid else ())
    sorted_ops = jax.lax.sort(ops, dimension=1, num_keys=1, is_stable=True)
    _, xs, ys, zs, lbs = sorted_ops[:5]
    pids = sorted_ops[5] if carry_pid else jnp.full_like(layout.pid, -1)
    d2s, als = azimuth_2d(xs, ys)
    return layout._replace(x=xs, y=ys, z=zs, d2=d2s, alpha=als, label=lbs,
                           pid=pids)
