"""Ground the multi-chip (azimuth-sharded) projection with real-chip data.

Only ONE physical TPU is reachable in this environment, so the
sequence-parallel pipeline's per-wedge COMPUTE cost is measured by running
the single-device pipeline on wedge-sized inputs (a 1/8 azimuth slice of an
OS1-128-scale scan: max_points/8, ring_capacity/8).  The collective costs
(ring-halo ppermute, blocked-bit psum, marker min/max combines) are small,
fixed-size transfers — per scan: 2 x (rings x curb_points x 5 fields) halo
floats (~20 KB), a (rings x 362) bit psum (~92 KB), and (361 x 6) marker
combines — well under 1 ms of ICI time at v5e link rates; the wedge compute
below is the dominant term.

Usage:  python tools/bench_sp.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from urban_road_filter_tpu.config import FilterConfig, PipelineDims
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
    from urban_road_filter_tpu.pipeline import pad_scan, process_batch_jit

    cfg = FilterConfig()
    n_wedges = 8
    # One wedge of an os1-128 scan: 262144/8 points, ring capacity 8192/8.
    dims = PipelineDims(max_points=262144 // n_wedges, rings=128,
                        ring_capacity=8192 // n_wedges, beam_capacity=64)
    batch = 16

    full = make_scan(SCENES["two_curbs"](), n_rings=128, n_azimuth=2048,
                     seed=0, elev_lo_deg=-40.0, elev_hi_deg=-2.0)
    # A contiguous azimuth wedge (the SP partition gives each device one).
    from urban_road_filter_tpu.oracle.reference import azimuth_2d

    _, aa = azimuth_2d(full[:, 0].astype(np.float32),
                       full[:, 1].astype(np.float32))
    sel = (aa >= 90.0) & (aa < 90.0 + 360.0 / n_wedges)
    wedge = full[np.where(np.isnan(aa), False, sel)]
    scans = np.stack([pad_scan(wedge, dims.max_points)] * batch)
    pts = jax.numpy.asarray(scans)

    np.asarray(jax.numpy.zeros((8,), jax.numpy.int32))  # tunnel warm-up
    out = process_batch_jit(pts, cfg, dims)
    np.asarray(out.ok)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = process_batch_jit(pts, cfg, dims)
        np.asarray(out.ok)
    dt = (time.perf_counter() - t0) / iters

    ms_per_wedge = dt / batch * 1e3
    print(json.dumps({
        "metric": "sp_wedge_ms_os1-128_8way",
        "value": round(ms_per_wedge, 3),
        "unit": "ms/wedge-scan",
        "detail": {
            "wedge_points": int(len(wedge)),
            "dims": {"max_points": dims.max_points, "rings": dims.rings,
                     "ring_capacity": dims.ring_capacity},
            "projected_8chip_scans_per_sec": round(1000.0 / ms_per_wedge, 1),
            "note": "compute-only; halo/psum collectives add <1 ms (see "
                    "module docstring)",
        },
    }))


if __name__ == "__main__":
    main()
