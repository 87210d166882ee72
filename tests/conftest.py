"""Test configuration.

Multi-device sharding tests run on a virtual 8-device CPU mesh
(SURVEY.md section 4, test plan item 4) — the same shard_map/collective
code paths as a real TPU slice, no hardware needed.  These env vars must be
set before jax initializes, hence here in conftest at import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The image's axon TPU plugin overrides JAX_PLATFORMS; pin CPU explicitly so
# the virtual 8-device mesh is always available to sharding tests.
jax.config.update("jax_platforms", "cpu")

# Opt-in NaN tripwire (SURVEY.md section 5 hardening): URF_DEBUG_NANS=1 makes
# every jitted op fault on a NaN producer instead of propagating it.  Off by
# default — the pipeline legitimately carries NaN azimuths for degenerate
# (x=y=0) points, so this is a debugging mode, not a CI default.
if os.environ.get("URF_DEBUG_NANS") == "1":
    jax.config.update("jax_debug_nans", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from urban_road_filter_tpu.config import FilterConfig  # noqa: E402
from urban_road_filter_tpu.io.synthetic import SCENES, make_scan  # noqa: E402


@pytest.fixture(scope="session")
def default_cfg():
    return FilterConfig()


@pytest.fixture(scope="session")
def scene_scans():
    """One modest scan per synthetic scene, shared across the session."""
    return {
        name: make_scan(spec(), n_rings=24, n_azimuth=384, seed=i)
        for i, (name, spec) in enumerate(SCENES.items())
    }


def marker_rows_boundary_ok(got3: np.ndarray, want3: np.ndarray) -> np.ndarray:
    """Per-row bool: a disagreeing marker row is LEGITIMATE only when a
    <=1-ulp numeric difference can flip the per-bin argmax — the two
    winners are a near-tie in distance, or a winner's azimuth sits within
    ~2 ulp of an integer 1-degree bin edge (VERDICT r2 item 8: everything
    else is a real bug, not tolerance)."""
    import math

    def azimuth(x, y):
        d2 = np.hypot(np.float64(x), np.float64(y))
        if d2 == 0:
            return 0.0
        b = float(np.clip(np.abs(x) / d2, -1, 1))
        a = math.degrees(math.asin(b))
        if x >= 0 and y <= 0:
            return a
        if x >= 0:
            return 180 - a
        if x < 0 and y >= 0:
            return 180 + a
        return 360 - a

    ok = np.zeros(len(got3), bool)
    for k in range(len(got3)):
        dj = np.hypot(got3[k, 0], got3[k, 1])
        do = np.hypot(want3[k, 0], want3[k, 1])
        near_tie = abs(dj - do) <= 4e-7 * max(dj, do, 1.0)
        edge = any(
            abs(azimuth(r[0], r[1]) - round(azimuth(r[0], r[1]))) <= 1e-4
            for r in (got3[k], want3[k]))
        ok[k] = near_tie or edge
    return ok


def assert_marker_rows(got_rows, want_rows, what: str = "markers") -> None:
    """Marker-row gate: every non-boundary row exact (coords to 1e-4)."""
    got_rows = np.asarray(got_rows)
    want_rows = np.asarray(want_rows)
    assert got_rows.shape == want_rows.shape
    same = np.all(np.abs(got_rows[:, :3] - want_rows[:, :3]) < 1e-4, axis=1)
    if not same.all():
        boundary = marker_rows_boundary_ok(got_rows[:, :3], want_rows[:, :3])
        bad = ~same & ~boundary
        assert not bad.any(), (
            f"{what}: {int(bad.sum())} NON-boundary rows differ "
            f"of {len(got_rows)} ({int((~same).sum())} total diffs)")


def assert_label_parity(got: np.ndarray, want: np.ndarray, min_agree: float,
                        what: str = "labels") -> None:
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape, (got.shape, want.shape)
    agree = float(np.mean(got == want)) if got.size else 1.0
    assert agree >= min_agree, (
        f"{what} parity {agree:.5f} < {min_agree} "
        f"({int(np.sum(got != want))}/{got.size} disagree)")


def assert_labels_exact_or_boundary(got, want, pts, what: str = "labels",
                                    tol_deg: float = 1e-4) -> None:
    """Exact-or-classified label gate (VERDICT r3 item 7): every flip must
    sit within ``tol_deg`` of an integer 1-degree azimuth boundary — the
    only cross-graph ulp-sensitive label gates left after the SP newY fix
    are the flood-fill window edges and marker bins, both degree-quantized.
    A flip anywhere else (including cascades from a flipped blocked bit)
    is an unexplained, failing divergence."""
    got = np.asarray(got)
    want = np.asarray(want)
    pts = np.asarray(pts)
    flips = np.nonzero(got != want)[0]
    if flips.size == 0:
        return
    from urban_road_filter_tpu.oracle.reference import azimuth_2d

    _, aa = azimuth_2d(pts[flips, 0].astype(np.float32),
                       pts[flips, 1].astype(np.float32))
    aa = np.where(np.isnan(aa), 0.5, aa)  # NaN azimuth: not a bin boundary
    near = np.abs(aa - np.round(aa)) <= tol_deg
    assert near.all(), (
        f"{what}: {int((~near).sum())} UNEXPLAINED label flips of "
        f"{flips.size} total (non-boundary azimuths "
        f"{aa[~near][:5].tolist()})")
