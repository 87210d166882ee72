"""Device-mesh helpers.

The reference is a single-threaded CPU node (SURVEY.md section 2: no
parallelism of any kind; ROS pub/sub is its only "communication").  Here the
scan stream is batched and sharded over a TPU mesh:

  * "data" axis — batch-of-scans data parallelism (embarrassingly parallel;
    the one axis the workload natively has, SURVEY.md section 2);
  * "azimuth" axis — sequence-parallel splitting of single huge scans by
    azimuth wedge (parallel.azimuth_parallel), with ppermute halos and psum
    reductions over ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "batch_sharding", "P"]


def make_mesh(n_data: int | None = None, n_azimuth: int = 1,
              devices=None) -> Mesh:
    """A (data, azimuth) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_azimuth
    need = n_data * n_azimuth
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev = np.asarray(devices[:need]).reshape(n_data, n_azimuth)
    return Mesh(dev, ("data", "azimuth"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over "data"; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))
