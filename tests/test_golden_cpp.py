"""Oracle-vs-real-C++ validation (SURVEY.md section 4, test plan item 1).

Compiles the reference's four algorithm files verbatim (tools/golden) and
runs them stage-by-stage on the synthetic scenes, comparing against the
NumPy oracle's corresponding stages.  Expected agreement is ~100%:
documented divergences (PARITY.md items 1-2: stable-vs-unstable sort tie
order, f64-rounded windowed sums) are measure-zero-to-rare, so the gate is
>=99.9% per stage with exactness tracked in the assert message.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, "tools/golden")

from urban_road_filter_tpu.config import FilterConfig
from urban_road_filter_tpu.oracle import reference as oracle

try:
    import runner

    BINARY = runner.build()
except Exception as e:  # toolchain/reference missing -> skip below
    BINARY = None
    _BUILD_ERR = e

F32 = np.float32

pytestmark = pytest.mark.skipif(
    BINARY is None, reason="g++ or /root/reference unavailable")


def _roi_points(scene_scans, name, cfg):
    pts = scene_scans[name].astype(F32)
    keep = oracle.roi_mask(pts, cfg)
    p = pts[keep]
    return p[:, 0].astype(F32), p[:, 1].astype(F32), p[:, 2].astype(F32)


def _agree(a, b, what, min_agree=0.999):
    a = np.concatenate([np.asarray(r).ravel() for r in a]) if isinstance(a, list) else np.asarray(a)
    b = np.concatenate([np.asarray(r).ravel() for r in b]) if isinstance(b, list) else np.asarray(b)
    assert a.shape == b.shape
    agree = float(np.mean(a == b)) if a.size else 1.0
    assert agree >= min_agree, (
        f"{what}: C++-vs-oracle agreement {agree:.6f} "
        f"({int(np.sum(a != b))}/{a.size} differ)")
    return agree


def _rings_pre_sort(x, y, z, labels_star, cfg):
    """Mirror run_oracle's ring wiring (oracle/reference.py:497-525) to
    produce the array3D inputs of the x/z-zero stage."""
    _, alpha_v = oracle.vertical_angles(x, y, z)
    reps = oracle.discover_rings(alpha_v, cfg.interval)
    angles = np.sort(reps)
    match = np.abs(angles[None, :] - alpha_v[:, None]) <= F32(cfg.interval)
    has = match.any(axis=1)
    ring_of = np.where(has, match.argmax(axis=1), -1)
    d2, alpha_a = oracle.azimuth_2d(x, y)
    rx, ry, rz, ra, rl = [], [], [], [], []
    maxd = np.zeros(max(len(angles), 1), F32)
    for k in range(len(angles)):
        ids = np.flatnonzero(ring_of == k)
        rx.append(x[ids].copy())
        ry.append(y[ids].copy())
        rz.append(z[ids].copy())
        ra.append(alpha_a[ids].copy())
        rl.append(labels_star[ids].astype(np.int32).copy())
        if ids.size:
            maxd[k] = d2[ids].max()
    return rx, ry, rz, ra, rl, maxd


SCENES_TO_CHECK = ("two_curbs", "blind_spot", "wall", "flat", "curb_gap")


@pytest.mark.parametrize("scene", SCENES_TO_CHECK)
def test_star_stage_matches_cpp(scene, scene_scans):
    cfg = FilterConfig()
    x, y, z = _roi_points(scene_scans, scene, cfg)
    got = runner.star(BINARY, x, y, z, cfg)
    want = np.zeros(x.shape[0], np.int16)
    oracle.star_shaped_search(x, y, z, want, cfg)
    _agree(got, want.astype(np.int64), f"star[{scene}]")
    assert (np.asarray(got) == 2).sum() > 0 or scene == "flat"


@pytest.mark.parametrize("scene", SCENES_TO_CHECK)
def test_xz_stage_matches_cpp(scene, scene_scans):
    cfg = FilterConfig()
    x, y, z = _roi_points(scene_scans, scene, cfg)
    star_l = np.zeros(x.shape[0], np.int16)
    oracle.star_shaped_search(x, y, z, star_l, cfg)
    rx, ry, rz, _, rl, _ = _rings_pre_sort(x, y, z, star_l, cfg)

    got = runner.xz(BINARY, rx, ry, rz, rl, cfg)

    want = [r.copy() for r in rl]
    for k in range(len(rx)):
        w16 = want[k].astype(np.int16)
        oracle._x_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        oracle._z_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        want[k] = w16.astype(np.int32)
    _agree(got, want, f"xz[{scene}]")


@pytest.mark.parametrize("scene", SCENES_TO_CHECK)
def test_blind_stage_matches_cpp(scene, scene_scans):
    cfg = FilterConfig()
    x, y, z = _roi_points(scene_scans, scene, cfg)
    star_l = np.zeros(x.shape[0], np.int16)
    oracle.star_shaped_search(x, y, z, star_l, cfg)
    rx, ry, rz, ra, rl, maxd = _rings_pre_sort(x, y, z, star_l, cfg)
    index = len(rx)
    for k in range(index):
        w16 = rl[k].astype(np.int16)
        oracle._x_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        oracle._z_zero_ring(rx[k], ry[k], rz[k], w16, cfg)
        rl[k] = w16
    # Azimuth sort between the stencil and flood-fill stages (the oracle's
    # stable sort stands in for the reference's unstable quicksort —
    # PARITY.md item 1; both backends then see the SAME sorted input).
    ra_s, rl_s = [], []
    for k in range(index):
        srt = np.argsort(ra[k], kind="stable")
        ra_s.append(ra[k][srt])
        rl_s.append(rl[k][srt])

    got = runner.blind(BINARY, ra_s, [r.astype(np.int32) for r in rl_s],
                       maxd, cfg)

    want = [r.copy() for r in rl_s]
    oracle._blind_spots(ra_s, want, index, maxd, cfg)
    _agree(got, [w.astype(np.int32) for w in want], f"blind[{scene}]")


def test_blind_stage_x_direction_variants(scene_scans):
    # The three xDirection gate shapes (blind_spots.cpp:75-99).
    x, y, z = _roi_points(scene_scans, "blind_spot", FilterConfig())
    for xdir in (0, 1, 2):
        cfg = FilterConfig(x_direction=xdir)
        star_l = np.zeros(x.shape[0], np.int16)
        oracle.star_shaped_search(x, y, z, star_l, cfg)
        rx, ry, rz, ra, rl, maxd = _rings_pre_sort(x, y, z, star_l, cfg)
        ra_s, rl_s = [], []
        for k in range(len(rx)):
            srt = np.argsort(ra[k], kind="stable")
            ra_s.append(ra[k][srt])
            rl_s.append(rl[k][srt].astype(np.int16))
        got = runner.blind(BINARY, ra_s, [r.astype(np.int32) for r in rl_s],
                           maxd, cfg)
        want = [r.copy() for r in rl_s]
        oracle._blind_spots(ra_s, want, len(rx), maxd, cfg)
        _agree(got, [w.astype(np.int32) for w in want], f"blind[xdir={xdir}]")
