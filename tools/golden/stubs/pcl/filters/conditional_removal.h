#pragma once
#include <functional>  // real PCL pulls this in transitively
#include <memory>
#include <vector>

#include "../point_cloud.h"

namespace pcl {
template <typename PointT>
class ConditionBase {
 public:
  typedef std::shared_ptr<ConditionBase<PointT>> Ptr;
  typedef std::shared_ptr<const ConditionBase<PointT>> ConstPtr;
  ConditionBase() {}
  virtual ~ConditionBase() {}
  virtual bool evaluate(const PointT&) const = 0;
};

// Functional subset of pcl::ConditionalRemoval used by the reference
// (lidar_segmentation.cpp:106-117): keep, in order, the points for which
// the condition evaluates true (keep_organized=false semantics).  The
// reference filters IN PLACE (input cloud == output cloud), hence the
// copy-then-swap.
template <typename PointT>
class ConditionalRemoval {
 public:
  void setCondition(typename ConditionBase<PointT>::Ptr c) { cond_ = c; }
  void setInputCloud(const std::shared_ptr<PointCloud<PointT>>& in) {
    in_ = in;
  }
  void filter(PointCloud<PointT>& out) {
    std::vector<PointT> kept;
    kept.reserve(in_->points.size());
    for (const auto& p : in_->points)
      if (cond_->evaluate(p)) kept.push_back(p);
    out.points.swap(kept);
  }

 private:
  typename ConditionBase<PointT>::Ptr cond_;
  std::shared_ptr<PointCloud<PointT>> in_;
};
}  // namespace pcl
