"""On-device parity gate, standalone (the same 4 SCENE x CONFIG pairs the
bench gate runs, at full 131k-pt dims) — for iterating on the classifier
or spot-checking a kernel change without paying bench.py's throughput
phase.  Run alone (never overlap TPU jobs), from /root/repo.

Usage: python tools/check_device_parity.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from urban_road_filter_tpu.config import FilterConfig, PipelineDims
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan
    from urban_road_filter_tpu.pipeline import pad_scan, process_scan_jit
    from urban_road_filter_tpu.utils.parity import device_parity_gate

    dims = PipelineDims(max_points=131072, rings=64, ring_capacity=2048,
                        beam_capacity=512)
    cfg = FilterConfig()
    cfg2 = cfg.replace(beam_zone=45.5, curb_height=0.11,
                       cylinder_deg_x=140.0, curb_slope_deg=45.0)
    cfg3 = cfg.replace(starbeam_filter=True, dmin_param=8)
    cfg4 = cfg3.replace(interval=0.3, beam_zone=42.5)
    pairs = [
        ("two_curbs/default", "two_curbs", 0, cfg),
        ("blind_spot/dyn-swap", "blind_spot", 1, cfg2),
        ("two_curbs/starbeam", "two_curbs", 31, cfg3),
        ("curb_gap/interval", "curb_gap", 32, cfg4),
    ]

    np.asarray(jax.numpy.zeros((8,), jax.numpy.int32))  # tunnel warm-up
    total_sys = 0
    for name, scene, seed, pcfg in pairs:
        raw = pad_scan(make_scan(SCENES[scene](), n_rings=64,
                                 n_azimuth=2048, seed=seed), dims.max_points)
        # Gate the BATCH graph (round 4): the production batch path runs
        # the fused ingest kernels that the single-scan graph skips
        # (pipeline.process_scan docstring); same compile count as b8
        # configs dedupe to two static graphs.
        from urban_road_filter_tpu.pipeline import process_batch_jit

        out8 = process_batch_jit(
            jax.numpy.asarray(np.broadcast_to(raw, (8,) + raw.shape)),
            pcfg, dims)
        out = jax.tree.map(lambda a: a[0], out8)
        np.asarray(out.ok)
        try:
            agree, n_sys = device_parity_gate(raw, out.labels, out.markers,
                                              pcfg, name)
        except AssertionError as e:
            print(f"{name:24s} MARKER GATE FAILED: {e}", flush=True)
            total_sys += 1
            continue
        total_sys += n_sys
        print(f"{name:24s} agree {agree:.5f}  systematic {n_sys}",
              flush=True)
    print(f"total systematic: {total_sys}")
    return 1 if total_sys else 0


if __name__ == "__main__":
    sys.exit(main())
