"""Synthetic LiDAR scan generation for tests and benchmarks.

Replaces the reference's demo-rosbag validation flow (README.md:22-52) with
deterministic, parameterised scenes: flat road, curbs, ramps, walls and
blind-spot scenarios (SURVEY.md section 4, test plan item 1a).

Scans are emitted azimuth-major (one full ring column per firing), the way a
spinning sensor delivers points, so within-ring input order equals azimuth
order — the property the reference's x/z-zero stencils implicitly rely on
(they run *before* the per-ring azimuth sort, lidar_segmentation.cpp:280-291).
Missing returns are encoded as (0,0,0) points, exercising the
`x + y + z != 0` drop in the ROI filter (lidar_segmentation.cpp:111).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

__all__ = ["SceneSpec", "make_scan", "SCENES", "random_scan"]


@dataclasses.dataclass(frozen=True)
class SceneSpec:
    """Piecewise-flat world: road plane at z = -sensor_height, optional
    sidewalk steps along +/-y, optional walls, optional ramp along x."""

    sensor_height: float = 1.7
    curb_right_y: float | None = 3.5    # sidewalk for y >= curb_right_y
    curb_left_y: float | None = -3.5    # sidewalk for y <= curb_left_y
    curb_height: float = 0.18
    ramp_slope: float = 0.0             # dz/dx of the road surface
    wall_x: float | None = None         # vertical wall at x = wall_x
    curb_gap: tuple[float, float] | None = None  # x-range with no curbs (gap)
    obstacles: tuple[tuple[float, float, float], ...] = ()  # (x, y, radius) posts


def _ground_z(spec: SceneSpec, xx: np.ndarray, yy: np.ndarray) -> np.ndarray:
    """Surface height z(x, y) of the piecewise world."""
    z = -spec.sensor_height + spec.ramp_slope * np.maximum(xx, 0.0)
    on_side = np.zeros_like(xx, dtype=bool)
    if spec.curb_right_y is not None:
        on_side |= yy >= spec.curb_right_y
    if spec.curb_left_y is not None:
        on_side |= yy <= spec.curb_left_y
    if spec.curb_gap is not None:
        g0, g1 = spec.curb_gap
        on_side &= ~((xx >= g0) & (xx <= g1))
    return z + np.where(on_side, spec.curb_height, 0.0)


def make_scan(
    spec: SceneSpec,
    n_rings: int = 32,
    n_azimuth: int = 1024,
    elev_lo_deg: float = -24.0,
    elev_hi_deg: float = -2.0,
    range_noise: float = 0.008,
    dropout: float = 0.02,
    max_range: float = 80.0,
    seed: int = 0,
) -> np.ndarray:
    """Ray-march a spinning LiDAR over the scene.  Returns (N, 4) float32
    [x, y, z, intensity], azimuth-major, N = n_rings * n_azimuth."""
    rng = np.random.default_rng(seed)
    elev = np.deg2rad(np.linspace(elev_lo_deg, elev_hi_deg, n_rings))
    azim = 2.0 * np.pi * np.arange(n_azimuth) / n_azimuth

    # (A, R) ray direction components, azimuth-major layout.
    ca, sa = np.cos(azim)[:, None], np.sin(azim)[:, None]
    ce, se = np.cos(elev)[None, :], np.sin(elev)[None, :]
    dx, dy, dz = ca * ce, sa * ce, se * np.ones_like(ca)

    # March each ray to the surface (bisection on f(t) = z(t) - ground_z).
    t = np.full(dx.shape, np.nan)
    going_down = dz < 0
    lo = np.full(dx.shape, 0.05)
    hi = np.full(dx.shape, max_range)
    for _ in range(48):  # bisection: surface is piecewise flat, this converges
        mid = 0.5 * (lo + hi)
        above = mid * dz > _ground_z(spec, mid * dx, mid * dy)
        lo = np.where(above, mid, lo)
        hi = np.where(above, hi, mid)
    t = np.where(going_down, 0.5 * (lo + hi), np.nan)
    # Rays that never reach the surface within range -> no return.
    t = np.where(t > max_range * 0.999, np.nan, t)

    # Optional vertical wall at x = wall_x (blocks rays before the ground).
    if spec.wall_x is not None:
        with np.errstate(divide="ignore", invalid="ignore"):
            tw = spec.wall_x / dx
        tw = np.where((dx > 1e-9) & (tw > 0.05), tw, np.inf)
        t = np.where(tw < np.nan_to_num(t, nan=np.inf), tw, t)

    # Optional cylindrical posts (for blind-spot scenes).
    for ox, oy, orad in spec.obstacles:
        # Ray-circle intersection in the xy plane.
        b = dx * ox + dy * oy
        c = ox * ox + oy * oy - orad * orad
        disc = b * b - (dx * dx + dy * dy) * c
        with np.errstate(invalid="ignore"):
            tq = (b - np.sqrt(np.maximum(disc, 0.0))) / (dx * dx + dy * dy)
        hit = (disc > 0) & (tq > 0.05)
        tq = np.where(hit, tq, np.inf)
        t = np.where(tq < np.nan_to_num(t, nan=np.inf), tq, t)

    if range_noise > 0:
        t = t + rng.normal(0.0, range_noise, t.shape)

    x = (t * dx).astype(np.float32)
    y = (t * dy).astype(np.float32)
    z = (t * dz).astype(np.float32)
    miss = ~np.isfinite(t)
    if dropout > 0:
        miss |= rng.random(t.shape) < dropout
    x = np.where(miss, 0.0, x).astype(np.float32)
    y = np.where(miss, 0.0, y).astype(np.float32)
    z = np.where(miss, 0.0, z).astype(np.float32)
    inten = rng.random(t.shape).astype(np.float32)

    return np.stack([x, y, z, inten], axis=-1).reshape(-1, 4)


def random_scan(n: int, seed: int = 0, box=(0.0, 30.0, -10.0, 10.0, -3.0, -1.0)) -> np.ndarray:
    """Uniform random points in (and slightly beyond) the ROI box, for fuzzing."""
    rng = np.random.default_rng(seed)
    x0, x1, y0, y1, z0, z1 = box
    pad = 2.0
    pts = np.stack(
        [
            rng.uniform(x0 - pad, x1 + pad, n),
            rng.uniform(y0 - pad, y1 + pad, n),
            rng.uniform(z0 - pad, z1 + pad, n),
            rng.random(n),
        ],
        axis=-1,
    ).astype(np.float32)
    return pts


SCENES: dict[str, Callable[[], SceneSpec]] = {
    "flat": lambda: SceneSpec(curb_right_y=None, curb_left_y=None),
    "two_curbs": lambda: SceneSpec(),
    "high_curbs": lambda: SceneSpec(curb_height=0.35),
    "ramp": lambda: SceneSpec(ramp_slope=0.03),
    "wall": lambda: SceneSpec(wall_x=18.0),
    "curb_gap": lambda: SceneSpec(curb_gap=(8.0, 12.0)),
    "blind_spot": lambda: SceneSpec(
        obstacles=((2.5, 2.0, 0.4), (2.5, -2.0, 0.4), (-1.5, 2.0, 0.4))),
}
