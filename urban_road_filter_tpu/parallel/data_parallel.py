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
    """Returns fn(pts_batch (B, N, 4)) -> ScanResult with leading B axis,
    input/output sharded over the mesh "data" axis."""
    in_sharding = batch_sharding(mesh, 3)

    @functools.partial(jax.jit, in_shardings=(in_sharding,),
                       out_shardings=batch_sharding(mesh, 1))
    def run(pts):
        return jax.vmap(lambda p: process_scan(p, cfg, dims))(pts)

    return run
