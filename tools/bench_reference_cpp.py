"""Measure the reference C++ node's single-core throughput on this host.

Compiles the reference's complete `Detector::filtered`
(/root/reference/src, verbatim via tools/golden) and times the filtered()
call per scan (GOLDEN_TIME=1 chrono in golden_full.cpp — stdin parse and
output serialization excluded) on the SAME scans bench.py feeds the TPU:
64-ring, 2048-azimuth synthetic scenes at ~100k in-ROI points.

This turns the README's "single-core C++ reference" comparison into a
measured number with a stated host, replacing the paper-derived estimate.
The reference publishes no benchmark figures of its own (BASELINE.md).

Usage: python tools/bench_reference_cpp.py [--scans 12] [--scene two_curbs]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.golden import runner  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scans", type=int, default=12)
    ap.add_argument("--scene", default="two_curbs")
    args = ap.parse_args()

    from urban_road_filter_tpu.config import FilterConfig
    from urban_road_filter_tpu.io.synthetic import SCENES, make_scan

    binary = runner.build_full()
    if binary is None:
        print("reference sources or g++ unavailable", file=sys.stderr)
        return 1

    cfg = FilterConfig()
    scans = [make_scan(SCENES[args.scene](), n_rings=64, n_azimuth=2048,
                       seed=i)[:, :3]
             for i in range(args.scans)]
    pts = int(np.mean([len(s) for s in scans]))
    print(f"{args.scans} scans, ~{pts} pts each, scene={args.scene}")

    # Reuse runner.full()'s wire protocol but surface the GOLDEN_TIME
    # stderr summary.
    env = dict(os.environ, GOLDEN_TIME="1")
    payload = runner._full_payload(scans, cfg)
    proc = subprocess.run([binary], input=payload, stdout=subprocess.PIPE,
                          stderr=subprocess.PIPE, env=env)
    if proc.returncode != 0:
        print(proc.stderr.decode(), file=sys.stderr)
        return proc.returncode
    for line in proc.stderr.decode().splitlines():
        if line.startswith("GOLDEN_TIME"):
            print(line)
    return 0


if __name__ == "__main__":
    sys.exit(main())
