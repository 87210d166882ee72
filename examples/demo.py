"""Demo drive — the launch/demo1.launch equivalent (reference C13).

Where the reference launches the node + rviz + rqt_reconfigure on the campus
rosbag (launch/demo1.launch:1-8), this script replays a synthetic drive
through the pipeline, renders every Nth scan to PNG (the rviz displays), and
hot-swaps a parameter mid-run (the rqt_reconfigure interaction).

    python examples/demo.py --out /tmp/demo --scans 20
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from urban_road_filter_tpu.config import FilterConfig, PipelineDims
from urban_road_filter_tpu.io.replay import ReplayHarness, scene_source
from urban_road_filter_tpu.viz import save_scan_png


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/urf_demo")
    ap.add_argument("--scene", default="two_curbs")
    ap.add_argument("--scans", type=int, default=10)
    ap.add_argument("--render-every", type=int, default=5)
    ap.add_argument("--swap-at", type=int, default=None,
                    help="scan index at which to hot-swap beam_zone to 50")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    dims = PipelineDims(max_points=32768, ring_capacity=2048, beam_capacity=512)

    def on_scan(outputs):
        if outputs.seq % args.render_every == 0:
            path = os.path.join(args.out, f"scan_{outputs.seq:04d}.png")
            save_scan_png(outputs, path)
            print(f"rendered {path}")
        print(outputs.stats.to_json())
        # Live reconfiguration between scans (dynamic_reconfigure analogue).
        if args.swap_at is not None and outputs.seq == args.swap_at:
            h.cfg = h.cfg.replace(beam_zone=50.0)
            print(f"# hot-swapped beam_zone -> 50.0 at scan {outputs.seq}")

    h = ReplayHarness(cfg=FilterConfig(), dims=dims, on_scan=on_scan)
    metrics = h.run(scene_source(args.scene, n_scans=args.scans,
                                 n_rings=32, n_azimuth=1024),
                    max_scans=args.scans)
    print(json.dumps(metrics.summary()))


if __name__ == "__main__":
    main()
