from urban_road_filter_tpu.io.synthetic import SCENES, SceneSpec, make_scan, random_scan

__all__ = ["SCENES", "SceneSpec", "make_scan", "random_scan"]
