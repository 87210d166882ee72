"""End-to-end jitted pipeline: one scan (or a batch) in, labels + markers out.

Device dataflow (mirrors the reference callback Detector::filtered,
lidar_segmentation.cpp:95-621, re-laid-out for TPU):

    (N, 4) points
      -> ROI mask                                (L2, ops.geometry.roi_mask)
      -> star-shaped hits on raw points          (L3, ops.star: <=360 hits)
      -> vertical angle, ring discovery/binning  (L2, ops.geometry)
      -> tensorize x/y/z to (64, P), input order (L2; returns per-point pos)
      -> star hits scattered onto the layout     (360-element scatter)
      -> x-zero / z-zero stencils                (L3, ops.xzero / ops.zzero)
      -> blind-spot flood fill (order-free)      (L4, ops.blind_spots)
      -> azimuth sort feeding ONLY the markers   (L2/L5)
      -> marker segment reductions               (L5, ops.markers)
      -> per-point labels by (ring, pos) table-gather (ops.gather)

Everything is static-shaped; the config is a static (hashable) argument, so
changing parameters re-traces — the functional analogue of
dynamic_reconfigure.  Batch processing is vmap over the leading axis.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.constants import LABEL_CURB, MIN_POINTS
from urban_road_filter_tpu.ops import geometry
from urban_road_filter_tpu.ops.blind_spots import blind_spots
from urban_road_filter_tpu.ops.markers import marker_points
from urban_road_filter_tpu.ops.xzero import x_zero
from urban_road_filter_tpu.ops.zzero import z_zero

F32 = jnp.float32
I32 = jnp.int32


class ScanResult(NamedTuple):
    """Per-scan outputs (all fixed-shape; host slices by masks)."""

    ok: jax.Array  # bool: >= 30 points in ROI (lidar_segmentation.cpp:124)
    roi: jax.Array  # (N,) bool
    labels: jax.Array  # (N,) int8 in {0,1,2}; 0 for non-ROI points
    # (int8 since round 2: 4x smaller D2H for the streaming path)
    ring_id: jax.Array  # (N,) int32; dims.rings = dropped at binning
    num_rings: jax.Array  # int32
    counts: jax.Array  # (dims.rings,)
    max_distance: jax.Array  # (dims.rings,)
    markers: jax.Array  # (361, 6): exists, x, y, z, red, bin
    overflow: jax.Array  # int32: points dropped by ring-capacity
    star_overflow: jax.Array  # int32: always 0 since round 2 (the star
    # path keeps every point per beam; field retained for schema stability)
    probably_road: jax.Array  # (N,) bool: cfg.probably_road_ring membership


def _ingest_batch_tpu(pts: jax.Array, cfg: FilterConfig, dims: PipelineDims):
    """Batched TPU ingest on the native (B, N) streams — runs OUTSIDE the
    per-scan vmap so the fused kernels (ops/ingest_scan.py, round 4) see
    tile-native (8, cols) blocks.  A vmapped per-scan version needed
    (N,) -> (N/128, 128) retile copies on every stream, which cost as much
    as the fusions the kernels removed (PERF.md round 4).

    Returns (valid, fk, r_key, piece, ring_id, num_rings), all batched.
    Only the transcendentals (atan2 here, asin/acos in vertical_angles)
    stay XLA ops — Mosaic has no lowering for them
    (tools/probe_ingest_math.py)."""
    from urban_road_filter_tpu.ops.ingest_scan import (
        assign_rings_pallas, discover_rings_pallas, ingest_prep_pallas)

    if pts.shape[-1] == 4:  # (B, N, 4) row-major
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    else:  # (3, B, N) planar: each plane is already a lane-native stream
        x, y, z = pts[0], pts[1], pts[2]
    # The atan2 and the star keys exist only for the star search; non-star
    # configs skip the transcendental pass AND the kernel's two (B, N) key
    # stores (static flag — cfg.star_shaped_method is part of the jit key).
    star = bool(cfg.star_shaped_method)
    fi_raw = jnp.arctan2(y, x) if star else None
    valid, fk, rk, piece = ingest_prep_pallas(x, y, z, fi_raw, cfg,
                                              want_star_keys=star)

    _, alpha_v = geometry.vertical_angles(x, y, z)
    # NaN at non-ROI points stands in for the validity stream in the
    # discovery and ring-assign kernels (NaN matches no ring, exactly like
    # a dropped point); the mask fuses into the asin/acos pass above.
    alpha_m = jnp.where(valid, alpha_v, jnp.nan)
    angles, num_rings = discover_rings_pallas(alpha_m, cfg.interval,
                                              dims.rings)
    ring_id = assign_rings_pallas(alpha_m, angles, cfg.interval)
    return valid, fk, rk, piece, ring_id, num_rings


def process_scan(pts: jax.Array, cfg: FilterConfig, dims: PipelineDims,
                 _ingest=None) -> ScanResult:
    """Label one padded scan — (N, 4) row-major or (3, N) planar (round 5;
    see geometry.xyz_of: planar skips the device-side column relayout and
    never stages the unread intensity plane).  Trace-time config/dims.
    ``_ingest`` carries the batch path's precomputed ingest results (see
    _ingest_batch_tpu).  Single-scan TPU calls use the XLA ingest below:
    at B=1 the batch-aware kernels run at 1/8 sublane utilization and
    MEASURED ~9 ms slower per scan (latency p50 28.3 -> 37.3 ms), while
    the XLA ingest is within noise of the round-3 graph."""
    x, y, z, n = geometry.xyz_of(pts)
    rings = dims.rings

    if _ingest is not None:
        valid, fk0, rk0, piece, ring_id, num_rings = _ingest
    else:
        valid = geometry.roi_mask_xyz(x, y, z, cfg)
        piece = jnp.sum(valid).astype(I32)
        fk0 = rk0 = None
    ok = piece >= MIN_POINTS

    star_overflow = jnp.asarray(0, I32)
    hit_pids = None
    if cfg.star_shaped_method:
        # <=360 first-trigger hits (one per beam, star_shaped_search.cpp
        # breaks after the first); they reach the layout below through a
        # tiny 360-element scatter instead of an n-sized label pass.
        from urban_road_filter_tpu.ops.star import star_hits

        hit_pids, star_overflow = star_hits(pts, valid, cfg, fk=fk0,
                                            r_key=rk0)

    if _ingest is None:
        _, alpha_v = geometry.vertical_angles(x, y, z)
        angles, num_rings = geometry.discover_rings(alpha_v, valid,
                                                    cfg.interval, rings=rings)
        ring_id = geometry.assign_rings(alpha_v, valid, angles, cfg.interval)

    cap = dims.ring_capacity
    layout, pos = geometry.tensorize(x, y, z, ring_id, cap, rings=rings)
    max_dist = geometry.max_distance(layout)

    if hit_pids is not None:
        # Star curb marks onto the layout: gather the <=360 hit points'
        # (ring, slot) addresses, scatter LABEL_CURB.
        hp = jnp.clip(hit_pids - 1, 0, n - 1)
        landed = (hit_pids > 0) & (ring_id[hp] < rings) & (pos[hp] < cap)
        dst = jnp.where(landed, ring_id[hp] * I32(cap) + pos[hp],
                        I32(rings * cap))
        lab = jnp.zeros((rings * cap + 1,), I32).at[dst].set(LABEL_CURB)
        layout = layout._replace(label=lab[:rings * cap].reshape(
            rings, cap))

    if jax.default_backend() in ("tpu", "axon") and (
            cfg.x_zero_method or cfg.z_zero_method):
        # One fused VMEM-resident Pallas pass for both stencils (bit-equal
        # to the XLA ops; see ops/pallas_kernels.py).
        from urban_road_filter_tpu.ops.pallas_kernels import fused_xz_zero

        layout = fused_xz_zero(layout, cfg)
    else:
        if cfg.x_zero_method:
            layout = x_zero(layout, cfg)
        if cfg.z_zero_method:
            layout = z_zero(layout, cfg)

    # blind_spots is order-free (windows test each slot's own azimuth);
    # only the marker stage needs azimuth ORDER — and on TPU it needs only
    # the order RELATION, not a physically sorted layout.
    if jax.default_backend() in ("tpu", "axon"):
        # Sort-free marker path (round 3): lexicographic (ring, alpha,
        # slot) keys over the unsorted layout — equal to sorted-traversal
        # order bit-for-bit — replace the 13.3 ms/step azimuth sort; the
        # marker stage's non-road pass rides INSIDE the flood fill's
        # labeled kernel (want_marker_f), so only one extra streaming pass
        # (candidates) remains.
        from urban_road_filter_tpu.ops.marker_scan import (
            marker_points_unsorted_pallas)

        layout, kf = blind_spots(layout, max_dist, num_rings, cfg,
                                 want_marker_f=True)
        markers = marker_points_unsorted_pallas(layout, num_rings, kf=kf)
    else:
        layout = blind_spots(layout, max_dist, num_rings, cfg)
        sorted_layout = geometry.sort_by_azimuth(layout)
        markers = marker_points(sorted_layout, num_rings)

    # Final labels back to input-point order by TABLE-GATHER at each
    # point's (ring_id, pos) layout address (ops/gather.py; the round-1
    # n-element scatter-back cost ~0.75 ms/scan).  Dropped points stay 0,
    # like the reference: output clouds are built from array3D only.
    from urban_road_filter_tpu.ops.gather import gather_by_group_pos

    # i8 + minimal group pad (round 5): s8 dot at 2x MXU rate, half the
    # accumulator/g-reduce for 64-ring rigs (g_mult=8 pads 64 -> 64
    # instead of 128); bit-equal (tests/test_pallas_interpret.py).
    labels_out = gather_by_group_pos(
        layout.label.astype(F32), ring_id, pos, pack=4, i8=True,
        g_mult=8).astype(I32)

    # Gate everything on the >=30-point guard: a not-ok scan publishes nothing.
    gate = ok
    # int8 labels: 4x smaller D2H for the streaming path (values are {0,1,2}).
    labels_out = jnp.where(gate, labels_out, 0).astype(jnp.int8)
    markers = jnp.where(gate, markers, jnp.zeros_like(markers))

    return ScanResult(
        ok=ok, roi=valid & gate,  # a not-ok scan publishes NO topics,
        # including the roi cloud (lidar_segmentation.cpp:124)
        labels=labels_out, ring_id=ring_id,
        num_rings=num_rings, counts=layout.counts, max_distance=max_dist,
        markers=markers, overflow=layout.overflow,
        star_overflow=star_overflow,
        probably_road=(ring_id == int(cfg.probably_road_ring)) & gate)


# Trace counters (exposed for tests asserting the no-retrace hot-swap).
# "batch_ingest" records the ingest variant the LAST batch trace chose
# ("kernels" / "xla") so bench tools can report which graph actually ran.
TRACE_COUNTS = {"scan": 0, "batch": 0, "batch_ingest": None}

# URF_BATCH_INGEST is a TRACE-TIME knob (for tools/bench_ingest.py A/Bs:
# "kernels" forces the fused ingest kernels, "xla" the XLA ingest, default
# picks kernels on TPU backends).  Captured ONCE at import: flipping it
# after a graph is cached would silently reuse the old variant (ADVICE
# r4); _process_batch_dyn fails loudly on a mid-process flip instead.
_BATCH_INGEST_MODE = os.environ.get("URF_BATCH_INGEST", "auto")


@functools.partial(jax.jit, static_argnums=(2, 3))
def _process_scan_dyn(pts, dyn, static_cfg, dims) -> ScanResult:
    TRACE_COUNTS["scan"] += 1  # trace-time side effect only
    return process_scan(pts, static_cfg.merge(dyn), dims)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _process_batch_dyn(pts, dyn, static_cfg, dims) -> ScanResult:
    TRACE_COUNTS["batch"] += 1
    cfg = static_cfg.merge(dyn)
    mode = os.environ.get("URF_BATCH_INGEST", "auto")
    if mode != _BATCH_INGEST_MODE:
        raise RuntimeError(
            f"URF_BATCH_INGEST changed mid-process ({mode!r} vs the "
            f"import-time {_BATCH_INGEST_MODE!r}); it is a trace-time "
            f"knob — one variant per process (ADVICE r4)")
    # Planar batches are (3, B, N): the scan axis is 1, not 0 (see
    # pad_scan_planar / planarize_batch).
    scan_axis = 0 if pts.shape[-1] == 4 else 1
    if mode == "kernels" or (
            mode != "xla" and jax.default_backend() in ("tpu", "axon")):
        # Batch-aware ingest kernels run once over the (B, N) streams;
        # everything after ingest is per-scan-independent and vmaps.
        TRACE_COUNTS["batch_ingest"] = "kernels"
        ingest = _ingest_batch_tpu(pts, cfg, dims)
        return jax.vmap(
            lambda p, *ing: process_scan(p, cfg, dims, _ingest=ing),
            in_axes=(scan_axis,) + (0,) * len(ingest))(pts, *ingest)
    TRACE_COUNTS["batch_ingest"] = "xla"
    return jax.vmap(lambda p: process_scan(p, cfg, dims),
                    in_axes=scan_axis)(pts)


def process_scan_jit(pts: jax.Array, cfg: FilterConfig, dims: PipelineDims) -> ScanResult:
    """Jitted single-scan pipeline.  The config is split into a static
    (hashable) half — the jit cache key — and a pytree of dynamic scalar
    operands, so hot-swapping any continuous parameter between scans is a
    cache HIT (the reference's paramsCallback applies instantly,
    main.cpp:4-34; a 2-5 min server-side re-trace would not)."""
    static_cfg, dyn = cfg.split()
    return _process_scan_dyn(pts, dyn, static_cfg, dims)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _packed_scan_dyn(pts, dyn, static_cfg, dims):
    out = process_scan(pts, static_cfg.merge(dyn), dims)
    packed = (out.labels.astype(jnp.uint8)
              | (out.roi.astype(jnp.uint8) << 2)
              | (out.probably_road.astype(jnp.uint8) << 3))
    return packed, out.markers, out.ok, out.num_rings, out.overflow


def packed_scan_jit(pts: jax.Array, cfg: FilterConfig, dims: PipelineDims):
    """process_scan_jit with the three per-point planes packed into ONE
    uint8 plane: labels in bits 0-1 ({0,1,2}), roi in bit 2,
    probably_road in bit 3 — the low-bandwidth wire format for thin
    streaming hosts.  Per scan the host fetches ~N bytes instead of ~3N
    (on the ~12 MB/s tunneled dev backend that is ~20 ms less D2H per
    131k-pt scan, STREAM_r05).  Returns (packed, markers, ok, num_rings,
    overflow); unpack with unpack_planes.  Same dynamic-config split /
    no-retrace hot-swap as process_scan_jit."""
    static_cfg, dyn = cfg.split()
    return _packed_scan_dyn(pts, dyn, static_cfg, dims)


def unpack_planes(packed):
    """Host-side inverse of packed_scan_jit's plane packing:
    (labels uint8, roi bool, probably_road bool)."""
    return packed & 3, (packed & 4) != 0, (packed & 8) != 0


def process_batch_jit(pts: jax.Array, cfg: FilterConfig, dims: PipelineDims) -> ScanResult:
    """Batched pipeline — the throughput path (BASELINE config #4).

    Accepts (B, N, 4) row-major or (3, B, N) planar (planarize_batch);
    planar is the TPU-native orientation (no relayout copy, no unread
    intensity staging) and is what bench.py feeds."""
    static_cfg, dyn = cfg.split()
    return _process_batch_dyn(pts, dyn, static_cfg, dims)


def pad_scan(points, n: int):
    """Host helper: pad/truncate (M, 4) to (n, 4) float32; zero rows are
    dropped by the ROI filter exactly like real missing returns."""
    import numpy as np

    pts = np.zeros((n, 4), np.float32)
    m = min(len(points), n)
    pts[:m, : points.shape[1]] = points[:m, :4]
    return pts


def pad_scan_planar(points, n: int):
    """pad_scan's planar twin: (M, >=3) -> (3, n) float32 x/y/z planes.

    The planar orientation is the TPU-native one (round 5): each plane is
    a lane-contiguous (n,) stream, so the device graph skips the (n, 4)
    relayout copy before its per-column reads, and the intensity column —
    which no device stage consumes — is never staged (25 % less H2D)."""
    import numpy as np

    pts = np.zeros((3, n), np.float32)
    m = min(len(points), n)
    pts[:, :m] = np.asarray(points, np.float32)[:m, :3].T
    return pts


def planarize_batch(batch):
    """(B, N, >=3) row-major host batch -> contiguous (3, B, N) planar."""
    import numpy as np

    return np.ascontiguousarray(
        np.asarray(batch, np.float32)[..., :3].transpose(2, 0, 1))
