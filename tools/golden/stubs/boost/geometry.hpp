// Minimal boost::geometry stub: data_structures.hpp only declares
// linestring<point_xy<float>> members (used by the marker/polygon code in
// lidar_segmentation.cpp, which the golden harness does not link).
#pragma once
#include <vector>
namespace boost { namespace geometry { namespace model {
template <typename P>
struct linestring : std::vector<P> {};
namespace d2 {
template <typename T>
struct point_xy {
  T x_{}, y_{};
  point_xy() {}
  point_xy(T a, T b) : x_(a), y_(b) {}
};
}  // namespace d2
}}}  // namespace boost::geometry::model
