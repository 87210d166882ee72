"""Marker-point extraction (reference: lidar_segmentation.cpp:295-351).

The reference's hottest loop re-scans ALL points for each of 361 one-degree
bins (O(361*N), SURVEY.md section 3.2).  Here it is three segment
reductions over the sorted (ring, slot) layout:

  f[b]    = min scan-position of a non-road point in bin b   (scatter-min)
  maxd[b] = max 2-D radius of road points before f[b]        (scatter-max)
  g*[b]   = first scan-position attaining maxd[b]            (scatter-min)

"Scan position" is ring * P + slot — exactly the reference's (arc-major,
azimuth-minor) traversal order, so the early-`break` semantics (a non-road
point hides every later road point in its bin, cpp:317-339) are preserved
bit-for-bit.  Ties on distance keep the first point in scan order (the
reference's strict `d > maxDistanceRoad` update, cpp:329).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.constants import CHANNELS, LABEL_ROAD
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
    bin_of = jnp.where(a_ok, jnp.floor(alpha).astype(I32), I32(N_BINS))
    bin_flat = jnp.clip(bin_of, 0, N_BINS).reshape(-1)

    g = (jnp.arange(r, dtype=I32)[:, None] * I32(p) + slot).reshape(-1)
    lb = label.reshape(-1)
    d = layout.d2.reshape(-1)  # == the reference's marker distance (same formula)
    ok = a_ok.reshape(-1)

    # f[b]: first non-road point in scan order per bin.
    nonroad = ok & (lb != LABEL_ROAD)
    f = jnp.full((N_BINS + 1,), _BIG, I32).at[
        jnp.where(nonroad, bin_flat, N_BINS)].min(g)

    # Road candidates: before the first non-road point, distance > 0.
    cand = ok & (lb == LABEL_ROAD) & (g < f[bin_flat]) & (d > 0)
    maxd = jnp.zeros((N_BINS + 1,), F32).at[
        jnp.where(cand, bin_flat, N_BINS)].max(d)

    winner = cand & (d == maxd[bin_flat])
    gstar = jnp.full((N_BINS + 1,), _BIG, I32).at[
        jnp.where(winner, bin_flat, N_BINS)].min(g)

    exists = maxd[:N_BINS] > 0
    gsel = jnp.where(exists, gstar[:N_BINS], 0)
    ring_sel, slot_sel = gsel // p, gsel % p
    px = jnp.where(exists, layout.x[ring_sel, slot_sel], F32(0))
    py = jnp.where(exists, layout.y[ring_sel, slot_sel], F32(0))
    pz = jnp.where(exists, layout.z[ring_sel, slot_sel], F32(0))
    red = (f[:N_BINS] != _BIG).astype(F32)

    table = jnp.stack([
        exists.astype(F32), px, py, pz, red,
        jnp.arange(N_BINS, dtype=F32)], axis=1)
    return table


def compact_markers(table) -> tuple:
    """Host helper: dense (361, 6) device table -> (cM, 4) rows + bins,
    matching the oracle's marker_points/marker_bins."""
    import numpy as np

    t = np.asarray(table)
    sel = t[:, 0] > 0
    rows = t[sel][:, [1, 2, 3, 4]].astype(np.float32)
    bins = t[sel][:, 5].astype(np.int32)
    return rows, bins
