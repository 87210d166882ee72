"""Batch-of-scans data parallelism.

A scan batch — (B, N, 4) row-major or (3, B, N) planar (the TPU-native
orientation, pipeline.planarize_batch) — is sharded over the mesh "data"
axis; the pipeline is vmapped per scan, so XLA partitions every op along
the batch dimension with zero communication (the per-scan pipeline has no
cross-scan dependence).  This is new capability relative to the reference,
which processes one scan at a time and *drops* overflow via its queue-1
subscription (lidar_segmentation.cpp:53).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.parallel.mesh import batch_sharding
from urban_road_filter_tpu.pipeline import ScanResult, process_scan


def make_sharded_pipeline(mesh, cfg: FilterConfig, dims: PipelineDims):
    """Returns fn(pts_batch, cfg=None) -> ScanResult with leading B axis,
    output sharded over the mesh "data" axis.  ``pts_batch`` is (B, N, 4)
    row-major or (3, B, N) planar — the scan axis (0 or 1 respectively) is
    the sharded one; orientation is disambiguated by the trailing dim like
    geometry.xyz_of.  Passing a new ``cfg`` per call hot-swaps the dynamic
    parameters without re-trace (the static half re-traces, like the
    single-device path)."""
    static0, _ = cfg.split()

    @functools.partial(jax.jit, static_argnums=(2,),
                       out_shardings=batch_sharding(mesh, 1))
    def _run(pts, dyn, static_cfg):
        rcfg = static_cfg.merge(dyn)
        axis = 0 if pts.shape[-1] == 4 else 1
        return jax.vmap(lambda p: process_scan(p, rcfg, dims),
                        in_axes=axis)(pts)

    def run(pts, cfg_now: FilterConfig = None):
        st, dyn = (static0, cfg.split()[1]) if cfg_now is None else cfg_now.split()
        # Input sharding is enforced by placement (the jit then infers it):
        # the scan axis rides "data", everything else is replicated.
        spec = (P("data", None, None) if pts.shape[-1] == 4
                else P(None, "data", None))
        pts = jax.device_put(pts, NamedSharding(mesh, spec))
        return _run(pts, dyn, st)

    return run
