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


# Shared with the TPU bench gate (which must not import conftest — the
# CPU pin above would poison its backend); single source of truth lives
# in the package.
from urban_road_filter_tpu.utils.parity import (  # noqa: E402,F401
    marker_rows_boundary_ok)


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
