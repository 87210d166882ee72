"""Checkified pipeline entry: functional bounds validation (SURVEY §5).

The reference runs under AddressSanitizer in its CI-adjacent workflows and
relies on PCL's asserts for index safety; our analogue for a pure-JAX
pipeline is `jax.experimental.checkify` — every dynamic gather/scatter/
dynamic_slice in the XLA graph gets an in-graph bounds predicate, and the
accumulated error is fetched and raised on the host.  This catches the
class of bug the NaN tripwire (CI `jax_debug_nans` pass) cannot: manual
index arithmetic going out of range (ring/slot addresses, star hit pids,
marker bins).

Scope notes:
  * `index_checks` only by default.  `div_checks`/`nan_checks` trip on
    INTENTIONAL IEEE behavior the reference shares: the star walk divides
    by dz/dr before masking invalid steps (star_shaped_search.cpp:116
    divides unguarded the same way), and NaN coords flow through
    comparisons to be dropped exactly like the C++.
  * The Pallas kernels are not instrumentable by checkify; on CPU (where
    this mode is intended to run — tests, triage) the pipeline takes the
    pure-XLA fallbacks, so every stage is covered.  On TPU the XLA
    portions are still checked and the kernels' interpret-mode tests
    cover the rest.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import checkify

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.pipeline import ScanResult, process_scan

INDEX_ERRORS = checkify.index_checks


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _checked_scan(pts, dyn, static_cfg, dims, errors):
    f = lambda p: process_scan(p, static_cfg.merge(dyn), dims)  # noqa: E731
    return checkify.checkify(f, errors=errors)(pts)


def process_scan_checked(pts, cfg: FilterConfig, dims: PipelineDims,
                         errors=None, throw: bool = True):
    """process_scan_jit with in-graph bounds validation.

    Returns the ScanResult; raises `checkify.JaxRuntimeError` on the first
    out-of-bounds index (with the offending source line) when throw=True,
    else returns (error, result) for the caller to inspect.  Shares the
    dynamic-operand config split, so hot-swapping continuous params stays
    a cache hit here too.
    """
    errors = INDEX_ERRORS if errors is None else errors
    static_cfg, dyn = cfg.split()
    err, out = _checked_scan(pts, dyn, static_cfg, dims, errors)
    if not throw:
        return err, out
    err.throw()
    return out


__all__ = ["process_scan_checked", "INDEX_ERRORS", "ScanResult"]
