#pragma once
#include <cstddef>
#include <memory>
#include <string>
#include <vector>

namespace pcl {
struct PCLHeader {
  unsigned seq = 0;
  unsigned long long stamp = 0;
  std::string frame_id;
};

// Only a publisher template argument in the reference; never constructed.
struct PCLPointCloud2 {};

template <typename PointT>
struct PointCloud {
  PCLHeader header;
  std::vector<PointT> points;
  std::size_t size() const { return points.size(); }
  void push_back(const PointT& p) { points.push_back(p); }
};

// ADL capture hooks for ros::Publisher::publish (golden_full.cpp defines
// them; the 3-mode harness never instantiates publish, so no link need).
template <typename PointT>
void golden_capture(const std::string& topic, const PointCloud<PointT>& c);
template <typename PointT>
void golden_capture(const std::string& topic,
                    const std::shared_ptr<PointCloud<PointT>>& c) {
  golden_capture(topic, *c);
}
}  // namespace pcl
