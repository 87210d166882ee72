"""Build a PointCloud2 rosbag from PCD files, an NPZ sequence, or a
synthetic scene — fixture tooling for the `replay --bag` path.

No recorded sensor data ships in this environment (zero egress; the
reference's 3.3 GB campus rosbag is likewise stripped from its repo), so
bags for testing are synthesized through the same writer that real rosbag
tooling can open; a user's genuine bag goes through the identical reader
code path (urban_road_filter_tpu/io/rosbag.py).

Usage:
    python tools/make_bag.py out.bag --pcd-dir tests/fixtures
    python tools/make_bag.py out.bag --scene two_curbs --scans 20
    python tools/make_bag.py drive.bag --drive os1_64 --scans 300
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out")
    ap.add_argument("--pcd-dir", default=None)
    ap.add_argument("--npz", default=None)
    ap.add_argument("--scene", default=None)
    ap.add_argument("--drive", default=None, metavar="SENSOR",
                    help="recorded-style procedural drive with the named "
                         "sensor model (vlp16 / os1_64 / os1_128)")
    ap.add_argument("--firings", type=int, default=None,
                    help="firings per revolution override (--drive)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scans", type=int, default=10)
    ap.add_argument("--topic", default="/left_os1/os1_cloud_node/points")
    ap.add_argument("--rate-hz", type=float, default=10.0)
    args = ap.parse_args()

    from urban_road_filter_tpu.io.rosbag import write_bag

    if args.drive:
        from urban_road_filter_tpu.io.synthetic import make_drive

        scans = list(make_drive(args.scans, sensor=args.drive,
                                seed=args.seed, rate_hz=args.rate_hz,
                                firings=args.firings))
    elif args.pcd_dir:
        from urban_road_filter_tpu.io.replay import pcd_dir_source

        scans = list(pcd_dir_source(args.pcd_dir))
    elif args.npz:
        from urban_road_filter_tpu.io.replay import npz_source

        scans = list(npz_source(args.npz))
    else:
        from urban_road_filter_tpu.io.replay import scene_source

        scans = list(scene_source(args.scene or "two_curbs",
                                  n_scans=args.scans))
    write_bag(args.out, scans, topic=args.topic, rate_hz=args.rate_hz)
    print(f"wrote {args.out}: {len(scans)} scans on {args.topic}")


if __name__ == "__main__":
    main()
