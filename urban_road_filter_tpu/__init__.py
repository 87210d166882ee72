"""urban_road_filter_tpu — TPU-native LiDAR road/curb segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
`jkk-research/urban_road_filter` (reference mounted at /root/reference):
per-scan labeling of LiDAR points as road / curb / unlabeled, road-boundary
polygon extraction, and a streaming replay runtime — redesigned as dense
tensor ops over a padded (batch, ring, azimuth-slot) layout, batched and
sharded over TPU meshes.
"""

from urban_road_filter_tpu.config import FilterConfig, PipelineDims

__version__ = "0.1.0"

__all__ = ["FilterConfig", "PipelineDims", "__version__"]
