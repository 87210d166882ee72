"""Checkified bounds validation (SURVEY §5 "checkify/bounds validation";
VERDICT r2 weak-item 7): the pipeline's manual index arithmetic — ring/slot
addresses, star hit pids, marker bins — runs with in-graph OOB predicates
and is clean; the harness actually detects OOB when one exists."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import checkify

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit
from urban_road_filter_tpu.utils.checked import process_scan_checked

DIMS = PipelineDims(max_points=8192, rings=64, ring_capacity=1024,
                    beam_capacity=256)


@pytest.mark.parametrize("cfg", [
    FilterConfig(),
    FilterConfig(starbeam_filter=True),
    FilterConfig(star_shaped_method=False, blind_spots=True, x_direction=0),
], ids=["default", "starbeam", "blind-no-star"])
def test_pipeline_index_clean(cfg):
    scan = make_scan(SCENES["two_curbs"](), n_rings=16, n_azimuth=384,
                     seed=7)
    pts = jnp.asarray(pad_scan(scan, DIMS.max_points))
    out = process_scan_checked(pts, cfg, DIMS)  # raises on any OOB index
    ref = process_scan_jit(pts, cfg, DIMS)
    np.testing.assert_array_equal(np.asarray(out.labels),
                                  np.asarray(ref.labels))


def test_checked_tiny_and_degenerate_scans():
    """The guard paths (ok=False, empty rings) index nothing OOB either."""
    cfg = FilterConfig()
    for pts in [np.zeros((DIMS.max_points, 4), np.float32),
                pad_scan(np.full((40, 4), np.nan, np.float32),
                         DIMS.max_points)]:
        process_scan_checked(jnp.asarray(pts), cfg, DIMS)


def test_harness_detects_oob():
    """Negative control: the same error set DOES flag a real OOB gather
    (guards against a silently impotent checkify configuration)."""
    from urban_road_filter_tpu.utils.checked import INDEX_ERRORS

    def bad(i):
        return jnp.arange(4)[i]

    err, _ = jax.jit(checkify.checkify(bad, errors=INDEX_ERRORS))(
        jnp.asarray(9))
    with pytest.raises(checkify.JaxRuntimeError):
        err.throw()


def test_checked_hot_swap_is_cache_hit():
    """The checked path shares the static/dynamic config split: swapping a
    continuous param must not re-trace."""
    from urban_road_filter_tpu.utils import checked as mod

    scan = make_scan(SCENES["two_curbs"](), n_rings=16, n_azimuth=384,
                     seed=9)
    pts = jnp.asarray(pad_scan(scan, DIMS.max_points))
    cfg = FilterConfig()
    process_scan_checked(pts, cfg, DIMS)
    sizes = mod._checked_scan._cache_size()
    out = process_scan_checked(pts, cfg.replace(max_x=12.0), DIMS)
    assert mod._checked_scan._cache_size() == sizes
    assert int(np.asarray(out.roi).sum()) > 0
