// boost::geometry stub with FUNCTIONAL subset for the reference's marker
// polygon code (lidar_segmentation.cpp:417-601): linestring append,
// clear, get<K>, and Ramer-Douglas-Peucker `simplify` (the same
// douglas_peucker / projected-point-distance strategy real boost uses;
// distances computed in double, strictly-greater-than-tolerance keeps a
// point — matching urban_road_filter_tpu/postprocess.py `rdp`).
#pragma once
#include <cmath>
#include <cstddef>
#include <memory>
#include <vector>

namespace boost {
// The reference uses boost::make_shared / implicit shared ptrs via PCL;
// alias onto the std equivalents.
using std::make_shared;
using std::shared_ptr;

namespace geometry {
namespace model {
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

// `line += xy(...)`: real boost gets this from boost::assign; ADL finds
// this overload through the linestring operand.
template <typename P>
linestring<P>& operator+=(linestring<P>& ls, const P& p) {
  ls.push_back(p);
  return ls;
}
}  // namespace model

template <std::size_t K, typename T>
T get(const model::d2::point_xy<T>& p) {
  return K == 0 ? p.x_ : p.y_;
}

template <typename G>
void clear(G& g) {
  g.clear();
}

namespace detail_rdp {
template <typename T>
inline double seg_dist(const model::d2::point_xy<T>& p,
                       const model::d2::point_xy<T>& a,
                       const model::d2::point_xy<T>& b) {
  const double px = p.x_ - a.x_, py = p.y_ - a.y_;
  const double sx = b.x_ - a.x_, sy = b.y_ - a.y_;
  const double l2 = sx * sx + sy * sy;
  if (l2 == 0.0) return std::sqrt(px * px + py * py);
  double t = (px * sx + py * sy) / l2;
  if (t < 0.0) t = 0.0;
  if (t > 1.0) t = 1.0;
  const double dx = px - t * sx, dy = py - t * sy;
  return std::sqrt(dx * dx + dy * dy);
}

template <typename P>
void dp(const std::vector<P>& pts, std::size_t a, std::size_t b,
        double tol, std::vector<bool>& keep) {
  if (b - a < 2) return;
  double md = -1.0;
  std::size_t mi = a + 1;
  for (std::size_t i = a + 1; i < b; i++) {
    const double d = seg_dist(pts[i], pts[a], pts[b]);
    if (d > md) {
      md = d;
      mi = i;
    }
  }
  if (md > tol) {
    keep[mi] = true;
    dp(pts, a, mi, tol, keep);
    dp(pts, mi, b, tol, keep);
  }
}
}  // namespace detail_rdp

template <typename P>
void simplify(const model::linestring<P>& in, model::linestring<P>& out,
              double tol) {
  out.clear();
  const std::size_t n = in.size();
  if (n < 3) {
    out.assign(in.begin(), in.end());
    return;
  }
  std::vector<bool> keep(n, false);
  keep[0] = keep[n - 1] = true;
  detail_rdp::dp(static_cast<const std::vector<P>&>(in), 0, n - 1, tol, keep);
  for (std::size_t i = 0; i < n; i++)
    if (keep[i]) out.push_back(in[i]);
}
}  // namespace geometry
}  // namespace boost
