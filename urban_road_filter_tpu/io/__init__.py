from urban_road_filter_tpu.io.synthetic import SCENES, SceneSpec, make_scan, random_scan

__all__ = ["SCENES", "SceneSpec", "make_scan", "random_scan",
           "read_bag", "write_bag", "bag_topics"]


def __getattr__(name):
    # Lazy: rosbag pulls bz2/struct only when actually used.
    if name in ("read_bag", "write_bag", "bag_topics"):
        from urban_road_filter_tpu.io import rosbag

        return getattr(rosbag, name)
    raise AttributeError(name)
