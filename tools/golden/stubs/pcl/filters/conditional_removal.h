#pragma once
#include <functional>  // real PCL pulls this in transitively
#include <memory>
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
}  // namespace pcl
