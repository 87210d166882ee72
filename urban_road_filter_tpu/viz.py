"""Lightweight scan visualizer — the rviz replacement (SURVEY.md section 5).

Renders one processed scan (road / curb / unlabeled points + marker strips)
as a top-down matplotlib figure, mirroring the demo rviz layout
(reference config/demo1.rviz shows the same five outputs).  Import is lazy
so headless/batch use never pays for matplotlib.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["plot_scan", "save_scan_png"]


def plot_scan(outputs, ax=None, max_points: int = 20000):
    """outputs: io.replay.ScanOutputs."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(9, 7))

    def sub(a):
        if len(a) > max_points:
            idx = np.random.default_rng(0).choice(len(a), max_points, replace=False)
            return a[idx]
        return a

    roi = sub(outputs.roi)
    ax.scatter(roi[:, 0], roi[:, 1], s=1.0, c="#c8c8c8", label="roi")
    road = sub(outputs.road)
    if len(road):
        ax.scatter(road[:, 0], road[:, 1], s=1.5, c="#2ca02c", label="road")
    curb = sub(outputs.curb)
    if len(curb):
        ax.scatter(curb[:, 0], curb[:, 1], s=4.0, c="#d62728", label="curb")
    if len(outputs.road_probably):
        pr = sub(outputs.road_probably)
        ax.scatter(pr[:, 0], pr[:, 1], s=2.0, c="#1f77b4", label="road_probably")

    for strip in outputs.marker_strips:
        if strip.action != "add" or len(strip.points) < 2:
            continue
        color = "#00a000" if strip.color == "green" else "#e00000"
        ax.plot(strip.points[:, 0], strip.points[:, 1], c=color, lw=1.8)

    ax.set_aspect("equal")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    ax.legend(loc="upper right", markerscale=4, fontsize=8)
    ax.set_title(f"scan {outputs.seq}: {outputs.stats.road_points} road / "
                 f"{outputs.stats.curb_points} curb / rings {outputs.stats.num_rings}")
    return ax


def save_scan_png(outputs, path: str, **kw) -> None:
    import matplotlib.pyplot as plt

    ax = plot_scan(outputs, **kw)
    ax.figure.savefig(path, dpi=110, bbox_inches="tight")
    plt.close(ax.figure)
