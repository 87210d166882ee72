"""Marker-point extraction (reference: lidar_segmentation.cpp:295-351).

The reference's hottest loop re-scans ALL points for each of 361 one-degree
bins (O(361*N), SURVEY.md section 3.2).  Here it is three segment
reductions over the sorted (ring, slot) layout:

  f[b]    = min scan-position of a non-road point in bin b
  maxd[b] = max 2-D radius of road points before f[b]
  g*[b]   = first scan-position attaining maxd[b]

"Scan position" is ring * P + slot — exactly the reference's (arc-major,
azimuth-minor) traversal order, so the early-`break` semantics (a non-road
point hides every later road point in its bin, cpp:317-339) are preserved.
Ties on distance keep the first point in scan order (the strict
`d > maxDistanceRoad` update, cpp:329).

TPU note: the reductions are DENSE (ring, slot, bin) compare-reduces — XLA
fuses the broadcast compares into the reductions, which beats scatter-min/
max segment ops on TPU by a wide margin (scatters serialize; streaming
compares ride the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.constants import LABEL_ROAD
from urban_road_filter_tpu.ops.geometry import RingLayout

F32 = jnp.float32
I32 = jnp.int32

N_BINS = 361  # i = 0..360 inclusive (lidar_segmentation.cpp:305)
_BIG = jnp.iinfo(jnp.int32).max


def marker_points(layout: RingLayout, num_rings: jax.Array):
    """Returns a dense (361, 6) table: [exists, x, y, z, red, bin]."""
    alpha, label, counts = layout.alpha, layout.label, layout.counts
    r, p = alpha.shape
    slot = jnp.arange(p)[None, :]
    valid = (slot < counts[:, None]) & (jnp.arange(r)[:, None] < num_rings)

    a_ok = valid & jnp.isfinite(alpha) & (alpha >= 0) & (alpha <= F32(360.0))
    bin_of = jnp.where(a_ok, jnp.floor(alpha).astype(I32), I32(-1))  # (R, P)
    g = jnp.arange(r, dtype=I32)[:, None] * I32(p) + slot  # scan position
    d = layout.d2  # == the reference's marker distance (same formula)
    road = label == LABEL_ROAD

    bins = jnp.arange(N_BINS, dtype=I32)  # (B,)
    in_bin = bin_of[:, :, None] == bins[None, None, :]  # (R, P, B), fused

    # f[b]: first non-road point in scan order per bin.
    nonroad = (~road & a_ok)[:, :, None] & in_bin
    f = jnp.min(jnp.where(nonroad, g[:, :, None], _BIG), axis=(0, 1))  # (B,)

    # Road candidates before f, distance > 0; farthest per bin.
    cand = (road & a_ok & (d > 0))[:, :, None] & in_bin & (g[:, :, None] < f)
    maxd = jnp.max(jnp.where(cand, d[:, :, None], F32(0)), axis=(0, 1))  # (B,)

    # Winner: first scan position attaining maxd (strict > update semantics).
    winner = cand & (d[:, :, None] == maxd)
    gstar = jnp.min(jnp.where(winner, g[:, :, None], _BIG), axis=(0, 1))

    # Winner coordinates, gather-free: unique winner per bin -> sum-combine.
    mine = winner & (g[:, :, None] == gstar)

    def pick(arr):
        return jnp.sum(jnp.where(mine, arr[:, :, None], F32(0)), axis=(0, 1))

    exists = maxd > 0
    px, py, pz = pick(layout.x), pick(layout.y), pick(layout.z)
    red = (f != _BIG).astype(F32)

    return jnp.stack([exists.astype(F32), px, py, pz, red,
                      bins.astype(F32)], axis=1)


def compact_markers(table) -> tuple:
    """Host helper: dense (361, 6) device table -> (cM, 4) rows + bins,
    matching the oracle's marker_points/marker_bins."""
    import numpy as np

    t = np.asarray(table)
    sel = t[:, 0] > 0
    rows = t[sel][:, [1, 2, 3, 4]].astype(np.float32)
    bins = t[sel][:, 5].astype(np.int32)
    return rows, bins
