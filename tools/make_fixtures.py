"""Generate recorded-style PCD fixtures for the parity suite.

The reference is validated on a campus rosbag (reference README.md:36-46);
we commit deterministic stand-ins: ray-traced scans of richer urban scenes
(parked-car clusters, construction gaps, hills) written as
`binary_compressed` PCD (PCL's default save format) with missing returns
encoded as NaN rows — exactly how PCL organized clouds come off a sensor
driver.  Regenerate with:  python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_road_filter_tpu.io.pcd import write_pcd
from urban_road_filter_tpu.io.synthetic import SceneSpec, make_scan

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")

# Parked cars: clusters of posts hugging the right curb line.
_cars = tuple((x0 + dx, 4.1 + dy, 0.45)
              for x0 in (6.0, 11.5, 19.0)
              for dx, dy in ((0.0, 0.0), (1.1, 0.15), (2.2, 0.05)))

SCENES = {
    "urban_parked": (SceneSpec(obstacles=_cars), 17),
    "urban_construction": (SceneSpec(curb_gap=(7.0, 13.0), wall_x=24.0,
                                     obstacles=((9.0, 1.5, 0.3),
                                                (10.5, -0.8, 0.3),
                                                (12.0, 2.2, 0.3))), 29),
    "urban_hill": (SceneSpec(ramp_slope=0.04, curb_height=0.22,
                             obstacles=((15.0, -3.0, 0.5),)), 41),
}


def recorded_style(scan: np.ndarray, seed: int) -> np.ndarray:
    """Missing returns (0,0,0) -> NaN rows; sprinkle extra NaN dropouts,
    like PCL organized clouds from real drivers."""
    rng = np.random.default_rng(seed)
    out = scan.astype(np.float32).copy()
    miss = (out[:, 0] + out[:, 1] + out[:, 2]) == 0
    extra = rng.random(len(out)) < 0.01
    out[miss | extra, :3] = np.nan
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, (spec, seed) in SCENES.items():
        scan = make_scan(spec, n_rings=32, n_azimuth=512, seed=seed)
        rec = recorded_style(scan, seed + 1)
        path = os.path.join(OUT, f"{name}.pcd")
        write_pcd(path, rec, compressed=True)
        n_nan = int(np.isnan(rec[:, 0]).sum())
        print(f"{path}: {len(rec)} pts ({n_nan} NaN), "
              f"{os.path.getsize(path)} bytes")


if __name__ == "__main__":
    main()
