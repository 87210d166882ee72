"""Multi-device tests on the virtual 8-device CPU mesh
(SURVEY.md section 4, item 4)."""

import jax
import numpy as np
import pytest

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.parallel.data_parallel import make_sharded_pipeline
from urban_road_filter_tpu.parallel.mesh import make_mesh
from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit

DIMS = PipelineDims(max_points=4096, rings=64, ring_capacity=512,
                    beam_capacity=128)


@pytest.fixture(scope="module")
def batch():
    scans = [make_scan(SCENES["two_curbs"](), n_rings=16, n_azimuth=192, seed=i)
             for i in range(8)]
    return np.stack([pad_scan(s, DIMS.max_points) for s in scans])


def test_eight_device_mesh_available():
    assert len(jax.devices()) >= 8


def test_data_parallel_matches_single_device(batch):
    cfg = FilterConfig()
    mesh = make_mesh(n_data=8)
    run = make_sharded_pipeline(mesh, cfg, DIMS)
    out = run(jax.numpy.asarray(batch))
    jax.block_until_ready(out)

    for i in range(len(batch)):
        single = process_scan_jit(jax.numpy.asarray(batch[i]), cfg, DIMS)
        np.testing.assert_array_equal(np.asarray(out.labels[i]),
                                      np.asarray(single.labels))
        assert int(out.num_rings[i]) == int(single.num_rings)

    # Output really is sharded over the data axis.
    shard_devs = {s.device for s in out.labels.addressable_shards}
    assert len(shard_devs) == 8


def test_data_parallel_2x4_mesh(batch):
    cfg = FilterConfig()
    mesh = make_mesh(n_data=4, n_azimuth=2)
    run = make_sharded_pipeline(mesh, cfg, DIMS)
    out = run(jax.numpy.asarray(batch[:4]))
    jax.block_until_ready(out)
    assert np.asarray(out.ok).all()


def test_data_parallel_planar_matches_row_major(batch):
    """Planar (3, B, N) input shards scan axis 1 and is bit-equal to the
    row-major DP path (and therefore, transitively, to single-device)."""
    from urban_road_filter_tpu.pipeline import planarize_batch

    cfg = FilterConfig()
    mesh = make_mesh(n_data=8)
    run = make_sharded_pipeline(mesh, cfg, DIMS)
    o_rows = run(jax.numpy.asarray(batch))
    o_planes = run(jax.numpy.asarray(planarize_batch(batch)))
    jax.block_until_ready((o_rows, o_planes))
    for name, a, b in zip(o_rows._fields, o_rows, o_planes):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"field {name}")
    shard_devs = {s.device for s in o_planes.labels.addressable_shards}
    assert len(shard_devs) == 8
