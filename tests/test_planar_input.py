"""Planar (3, N)/(3, B, N) input orientation (round 5).

The planar orientation exists purely for device-layout reasons (see
pipeline.pad_scan_planar): results must be IDENTICAL to the row-major
(N, 4) path — same jit graphs modulo the input slicing, so label, marker
and mask outputs must match bit-for-bit on the same backend.
"""

from __future__ import annotations

import numpy as np
import pytest

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
from urban_road_filter_tpu.pipeline import (
    pad_scan, pad_scan_planar, planarize_batch, process_batch_jit,
    process_scan_jit,
)

DIMS = PipelineDims(max_points=16384, rings=64, ring_capacity=1024,
                    beam_capacity=256)


def _scan(seed: int, scene: str = "two_curbs"):
    return make_scan(SCENES[scene](), n_rings=32, n_azimuth=384, seed=seed)


def _assert_tree_equal(a, b):
    for name, xa, xb in zip(a._fields, a, b):
        np.testing.assert_array_equal(np.asarray(xa), np.asarray(xb),
                                      err_msg=f"field {name}")


class TestPlanarHelpers:
    def test_pad_scan_planar_matches_pad_scan(self):
        raw = _scan(3)
        rows = pad_scan(raw, DIMS.max_points)
        planes = pad_scan_planar(raw, DIMS.max_points)
        assert planes.shape == (3, DIMS.max_points)
        np.testing.assert_array_equal(planes, rows[:, :3].T)

    def test_planarize_batch(self):
        rows = np.stack([pad_scan(_scan(i), DIMS.max_points)
                         for i in range(3)])
        planes = planarize_batch(rows)
        assert planes.shape == (3, 3, DIMS.max_points)
        assert planes.flags["C_CONTIGUOUS"]
        np.testing.assert_array_equal(planes, rows[..., :3].transpose(2, 0, 1))

    def test_bad_orientation_rejected(self):
        import jax.numpy as jnp

        from urban_road_filter_tpu.ops.geometry import xyz_of

        with pytest.raises(ValueError, match="row-major or"):
            xyz_of(jnp.zeros((5, 7)))


class TestPlanarEquivalence:
    @pytest.mark.parametrize("cfg", [
        FilterConfig(),
        FilterConfig().replace(starbeam_filter=True, dmin_param=8,
                               beam_zone=42.5),
    ], ids=["default", "starbeam"])
    def test_single_scan_bit_equal(self, cfg):
        raw = _scan(11, "blind_spot")
        rows = process_scan_jit(pad_scan(raw, DIMS.max_points), cfg, DIMS)
        planes = process_scan_jit(pad_scan_planar(raw, DIMS.max_points),
                                  cfg, DIMS)
        _assert_tree_equal(rows, planes)

    def test_batch_bit_equal(self):
        cfg = FilterConfig()
        rows = np.stack([
            pad_scan(_scan(i, "two_curbs" if i % 2 else "curb_gap"),
                     DIMS.max_points) for i in range(4)])
        o_rows = process_batch_jit(rows, cfg, DIMS)
        o_planes = process_batch_jit(planarize_batch(rows), cfg, DIMS)
        _assert_tree_equal(o_rows, o_planes)

    def test_intensity_is_ignored(self):
        # The planar path drops the intensity column; the row-major path
        # must therefore be independent of it for equivalence to be
        # meaningful.
        cfg = FilterConfig()
        rows = pad_scan(_scan(5), DIMS.max_points)
        noisy = rows.copy()
        noisy[:, 3] = np.linspace(0.0, 9.0, len(noisy), dtype=np.float32)
        _assert_tree_equal(process_scan_jit(rows, cfg, DIMS),
                           process_scan_jit(noisy, cfg, DIMS))
