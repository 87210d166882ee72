#pragma once
#include <string>
#include <vector>

#include <ros/ros.h>

// Field layout mirrors the real ROS messages the reference fills
// (lidar_segmentation.cpp:25-49,417-601): geometry_msgs::Point is float64,
// like ROS; the reference stores f32 values into it.
namespace std_msgs {
struct ColorRGBA {
  float r = 0, g = 0, b = 0, a = 0;
};
struct Header {
  unsigned seq = 0;
  ros::Time stamp;
  std::string frame_id;
};
}  // namespace std_msgs

namespace geometry_msgs {
struct Point {
  double x = 0, y = 0, z = 0;
};
struct Quaternion {
  double x = 0, y = 0, z = 0, w = 0;
};
struct Pose {
  Point position;
  Quaternion orientation;
};
struct Vector3 {
  double x = 0, y = 0, z = 0;
};
}  // namespace geometry_msgs

namespace visualization_msgs {
struct Marker {
  // Constants used by the reference (values = real ROS msg constants).
  // constexpr: implicitly inline under C++17, so no ODR definition needed.
  static constexpr int ADD = 0;
  static constexpr int DELETE = 2;
  static constexpr int LINE_STRIP = 4;

  std_msgs::Header header;
  int id = 0;
  int type = 0;
  int action = 0;
  geometry_msgs::Pose pose;
  geometry_msgs::Vector3 scale;
  std_msgs::ColorRGBA color;
  ros::Duration lifetime{0.0};
  std::vector<geometry_msgs::Point> points;
};
}  // namespace visualization_msgs
