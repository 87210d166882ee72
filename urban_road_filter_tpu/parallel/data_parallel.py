"""Batch-of-scans data parallelism.

A (B, N, 4) scan batch is sharded over the mesh "data" axis; the pipeline
is vmapped per scan, so XLA partitions every op along the batch dimension
with zero communication (the per-scan pipeline has no cross-scan
dependence).  This is new capability relative to the reference, which
processes one scan at a time and *drops* overflow via its queue-1
subscription (lidar_segmentation.cpp:53).
"""

from __future__ import annotations

import functools

import jax

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.parallel.mesh import batch_sharding
from urban_road_filter_tpu.pipeline import ScanResult, process_scan


def make_sharded_pipeline(mesh, cfg: FilterConfig, dims: PipelineDims):
    """Returns fn(pts_batch (B, N, 4), cfg=None) -> ScanResult with leading
    B axis, input/output sharded over the mesh "data" axis.  Passing a new
    ``cfg`` per call hot-swaps the dynamic parameters without re-trace
    (the static half re-traces, like the single-device path)."""
    in_sharding = batch_sharding(mesh, 3)
    static0, _ = cfg.split()

    @functools.partial(jax.jit, static_argnums=(2,),
                       in_shardings=(in_sharding, None),
                       out_shardings=batch_sharding(mesh, 1))
    def _run(pts, dyn, static_cfg):
        rcfg = static_cfg.merge(dyn)
        return jax.vmap(lambda p: process_scan(p, rcfg, dims))(pts)

    def run(pts, cfg_now: FilterConfig = None):
        st, dyn = (static0, cfg.split()[1]) if cfg_now is None else cfg_now.split()
        return _run(pts, dyn, st)

    return run
