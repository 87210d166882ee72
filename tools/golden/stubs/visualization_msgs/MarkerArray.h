#pragma once
#include <string>
#include <vector>

#include "Marker.h"

namespace visualization_msgs {
struct MarkerArray {
  std::vector<Marker> markers;
};

// ADL capture hook for ros::Publisher::publish (see stubs/ros/ros.h);
// defined by tools/golden/golden_full.cpp.
void golden_capture(const std::string& topic, const MarkerArray& ma);
}  // namespace visualization_msgs
