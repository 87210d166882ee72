#pragma once
#include <vector>
namespace pcl {
template <typename PointT>
struct PointCloud {
  std::vector<PointT> points;
  std::size_t size() const { return points.size(); }
};
}  // namespace pcl
