// Golden FULL-pipeline harness: drives the reference's Detector::filtered
// (lidar_segmentation.cpp:95-621, compiled VERBATIM from /root/reference/src
// together with the four algorithm translation units) end-to-end through
// capturing stub publishers, so the NumPy oracle and the TPU pipeline can be
// validated against the complete C++ node — ring discovery, arc build,
// azimuth quadrants, detection methods, flood fill, the marker-point search,
// run smoothing, RDP simplification, zavg and ghost-DELETE logic included
// (VERDICT r2 Missing #2: these stages previously had no C++ ground truth).
//
// Protocol (stdin, all i32/f32/f64 little-endian):
//   i32 n_scans
//   f32 interval, min_X, max_X, min_Y, max_Y, min_Z, max_Z, curbHeight,
//       beamZone, angleFilter1, angleFilter2, angleFilter3, kdev_param,
//       kdist_param, polysimp, polyz
//   i32 curbPoints, dmin_param, xDirection, x_zero, z_zero, star_shaped,
//       blind_spots, starbeam_filter, polysimp_allow, zavg_allow
//   per scan: i32 n; f32 x[n], y[n], z[n]
// Point intensity is set to the input index, so the published clouds carry
// exact input ids (f32-exact for n < 2^24).
//
// Per scan (stdout):
//   i32 published (0 -> <30-point early return, nothing else follows)
//   for road, curb, roi, road_probably: i32 count, i32 ids[count]
//   i32 n_markers; per marker: i32 id, action(0=ADD,2=DELETE),
//       red(0/1), n_points; f64 (x, y, z) * n_points
// GOLDEN_TIME=1 in the environment additionally times each
// det.filtered() call (chrono, compute only — stdin parse and output
// serialization excluded) and prints a per-scan latency summary to
// stderr: tools/bench_reference_cpp.py uses this to measure the
// reference's single-core throughput on this host.
#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <map>
#include <string>
#include <vector>

#include "urban_road_filter/data_structures.hpp"

static void rd(void* p, size_t n) {
  if (std::fread(p, 1, n, stdin) != n) {
    std::fprintf(stderr, "golden_full: short read\n");
    std::exit(2);
  }
}
static void wr(const void* p, size_t n) { std::fwrite(p, 1, n, stdout); }
static int rd_i32() { int v; rd(&v, 4); return v; }
static float rd_f32() { float v; rd(&v, 4); return v; }
static void wr_i32(int v) { wr(&v, 4); }
static void wr_f64(double v) { wr(&v, 8); }

// ---- capture state (filled by the stub publishers' ADL hooks) ----
static std::map<std::string, std::vector<int>> g_clouds;
static visualization_msgs::MarkerArray g_markers;
static bool g_have_markers = false;

namespace pcl {
template <>
void golden_capture<PointXYZI>(const std::string& topic,
                               const PointCloud<PointXYZI>& c) {
  std::vector<int> ids;
  ids.reserve(c.points.size());
  for (const auto& p : c.points) ids.push_back((int)p.intensity);
  g_clouds[topic] = std::move(ids);
}
}  // namespace pcl

namespace visualization_msgs {
void golden_capture(const std::string&, const MarkerArray& ma) {
  g_markers = ma;
  g_have_markers = true;
}
}  // namespace visualization_msgs

// star_shaped_search.cpp globals: beamp[rep] is left null by beam_init (the
// f == 360 path would null-deref, PARITY.md item 5a); patch to beam 0 like
// the oracle's f % 360 routing.
extern int rep;
extern std::vector<box> beams;
extern std::vector<box*> beamp;

int main() {
  ros::NodeHandle nh;

  const int n_scans = rd_i32();
  params::interval = rd_f32();
  params::min_X = rd_f32();
  params::max_X = rd_f32();
  params::min_Y = rd_f32();
  params::max_Y = rd_f32();
  params::min_Z = rd_f32();
  params::max_Z = rd_f32();
  params::curbHeight = rd_f32();
  params::beamZone = rd_f32();
  params::angleFilter1 = rd_f32();
  params::angleFilter2 = rd_f32();
  params::angleFilter3 = rd_f32();
  params::kdev_param = rd_f32();
  params::kdist_param = rd_f32();
  params::polysimp = rd_f32();
  params::polyz = rd_f32();
  params::curbPoints = rd_i32();
  params::dmin_param = rd_i32();
  params::xDirection = rd_i32();
  params::x_zero_method = rd_i32() != 0;
  params::z_zero_method = rd_i32() != 0;
  params::star_shaped_method = rd_i32() != 0;
  params::blind_spots = rd_i32() != 0;
  params::starbeam_filter = rd_i32() != 0;
  params::polysimp_allow = rd_i32() != 0;
  params::zavg_allow = rd_i32() != 0;
  params::fixedFrame = "golden";
  params::topicName = "golden_in";

  Detector det(&nh);          // subscribes, advertises, beam_init
  beamp[rep] = &beams[0];     // null-sentinel patch (see header comment)

  for (int s = 0; s < n_scans; s++) {
    const int n = rd_i32();
    std::vector<float> x(n), y(n), z(n);
    rd(x.data(), 4ul * n);
    rd(y.data(), 4ul * n);
    rd(z.data(), 4ul * n);

    pcl::PointCloud<pcl::PointXYZI> cloud;
    cloud.points.resize(n);
    for (int i = 0; i < n; i++) {
      cloud.points[i].x = x[i];
      cloud.points[i].y = y[i];
      cloud.points[i].z = z[i];
      cloud.points[i].intensity = (float)i;
    }

    g_clouds.clear();
    g_markers.markers.clear();
    g_have_markers = false;

    static const bool timing = std::getenv("GOLDEN_TIME") != nullptr;
    static std::vector<double> lat_ms;
    if (timing) {
      const auto t0 = std::chrono::steady_clock::now();
      det.filtered(cloud);
      const auto t1 = std::chrono::steady_clock::now();
      lat_ms.push_back(
          std::chrono::duration<double, std::milli>(t1 - t0).count());
      if (s == n_scans - 1) {
        std::vector<double> srt = lat_ms;
        std::sort(srt.begin(), srt.end());
        double sum = 0;
        for (double v : srt) sum += v;
        std::fprintf(stderr,
                     "GOLDEN_TIME scans=%zu mean_ms=%.2f p50_ms=%.2f "
                     "p90_ms=%.2f scans_per_sec=%.2f\n",
                     srt.size(), sum / srt.size(), srt[srt.size() / 2],
                     srt[(size_t)(srt.size() * 0.9)],
                     1000.0 * srt.size() / sum);
      }
    } else {
      det.filtered(cloud);
    }

    const bool published = g_clouds.count("roi") != 0;
    wr_i32(published ? 1 : 0);
    if (!published) continue;

    for (const char* t : {"road", "curb", "roi", "road_probably"}) {
      const auto& ids = g_clouds[t];
      wr_i32((int)ids.size());
      wr(ids.data(), 4ul * ids.size());
    }

    wr_i32(g_have_markers ? (int)g_markers.markers.size() : 0);
    if (g_have_markers) {
      for (const auto& m : g_markers.markers) {
        wr_i32(m.id);
        wr_i32(m.action);
        wr_i32(m.color.r > 0.5f ? 1 : 0);
        wr_i32((int)m.points.size());
        for (const auto& p : m.points) {
          wr_f64(p.x);
          wr_f64(p.y);
          wr_f64(p.z);
        }
      }
    }
  }
  std::fflush(stdout);
  return 0;
}
