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


def assert_label_parity(got: np.ndarray, want: np.ndarray, min_agree: float,
                        what: str = "labels") -> None:
    got = np.asarray(got)
    want = np.asarray(want)
    assert got.shape == want.shape, (got.shape, want.shape)
    agree = float(np.mean(got == want)) if got.size else 1.0
    assert agree >= min_agree, (
        f"{what} parity {agree:.5f} < {min_agree} "
        f"({int(np.sum(got != want))}/{got.size} disagree)")
