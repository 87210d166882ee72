// Golden harness: drives the REFERENCE's four algorithm translation units
// (x_zero_method.cpp, z_zero_method.cpp, star_shaped_search.cpp,
// blind_spots.cpp — compiled verbatim from /root/reference/src with stub
// ROS/PCL/boost headers) over a simple binary stdin/stdout protocol, so the
// NumPy oracle can be validated against the actual C++ (SURVEY.md section 4,
// test plan item 1; VERDICT round 1, Missing #2).
//
// Modes (argv[1]):
//   star  — beam_init + starShapedSearch over array2D
//   xz    — xZeroMethod / zZeroMethod over a pre-sort array3D
//   blind — blindSpots over an azimuth-sorted array3D
//
// All integers int32 LE, floats f32 LE.  See tools/golden/runner.py for the
// exact field order per mode.

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "urban_road_filter/data_structures.hpp"

// The harness links only the four algorithm TUs; Detector's constructor
// lives in lidar_segmentation.cpp, so provide the trivial definition the
// linker needs (the algorithm methods never touch instance state).
Detector::Detector(ros::NodeHandle*) {}

// star_shaped_search.cpp globals we must reach: beamp[rep] is left null by
// beam_init (the reference's f == 360 path would dereference it — a latent
// null-deref, see PARITY.md); patch the sentinel to beam 0, matching the
// oracle's f % 360 routing.
extern int rep;
extern std::vector<box> beams;
extern std::vector<box*> beamp;

static void rd(void* p, size_t n) {
  if (std::fread(p, 1, n, stdin) != n) {
    std::fprintf(stderr, "golden_harness: short read\n");
    std::exit(2);
  }
}

static void wr(const void* p, size_t n) { std::fwrite(p, 1, n, stdout); }

static int rd_i32() { int v; rd(&v, 4); return v; }
static float rd_f32() { float v; rd(&v, 4); return v; }

int main(int argc, char** argv) {
  if (argc < 2) {
    std::fprintf(stderr, "usage: golden_harness star|xz|blind < input.bin\n");
    return 2;
  }
  ros::NodeHandle nh;
  Detector det(&nh);
  const std::string mode = argv[1];

  if (mode == "star") {
    const int n = rd_i32();
    std::vector<float> x(n), y(n), z(n);
    rd(x.data(), 4ul * n);
    rd(y.data(), 4ul * n);
    rd(z.data(), 4ul * n);
    params::angleFilter3 = rd_f32();
    params::kdev_param = rd_f32();
    params::kdist_param = rd_f32();
    params::dmin_param = rd_i32();
    params::starbeam_filter = rd_i32() != 0;

    det.beam_init();
    beamp[rep] = &beams[0];  // null-sentinel patch (see header comment)

    std::vector<Point2D> a2(n);
    for (int i = 0; i < n; i++) {
      a2[i].p.x = x[i];
      a2[i].p.y = y[i];
      a2[i].p.z = z[i];
      a2[i].p.intensity = 0;
      a2[i].d = 0;
      a2[i].alpha = 0;
      a2[i].isCurbPoint = 0;
    }
    det.starShapedSearch(a2);

    std::vector<int> lab(n);
    for (int i = 0; i < n; i++) lab[i] = a2[i].isCurbPoint;
    wr(lab.data(), 4ul * n);
    return 0;
  }

  // xz / blind share the array3D framing.
  const int index = rd_i32();
  // indexArray mirrors the reference's `int indexArray[channels] = {0}`:
  // zero-padded well past `index` (blindSpots reads indexArray[1] even when
  // index <= 1).
  std::vector<int> cnt(index > 64 ? index + 1 : 65, 0);
  rd(cnt.data(), 4ul * index);
  int mx = 2;
  for (int k = 0; k < index; k++)
    if (cnt[k] + 1 > mx) mx = cnt[k] + 1;
  // Inner slack (+1) keeps the reference's benign one-past reads
  // (blind_spots.cpp:107,216) inside allocated memory, exactly like the
  // reference's `piece`-sized rows.
  std::vector<std::vector<Point3D>> a3(index > 2 ? index : 2,
                                       std::vector<Point3D>(mx));

  if (mode == "xz") {
    for (int k = 0; k < index; k++) {
      const int c = cnt[k];
      std::vector<float> bx(c), by(c), bz(c);
      std::vector<int> bl(c);
      rd(bx.data(), 4ul * c);
      rd(by.data(), 4ul * c);
      rd(bz.data(), 4ul * c);
      rd(bl.data(), 4ul * c);
      for (int j = 0; j < c; j++) {
        a3[k][j].p.x = bx[j];
        a3[k][j].p.y = by[j];
        a3[k][j].p.z = bz[j];
        a3[k][j].isCurbPoint = (short)bl[j];
        a3[k][j].newY = 0.0f;  // value-init in the reference's vector fill
      }
    }
    params::curbHeight = rd_f32();
    params::angleFilter1 = rd_f32();
    params::angleFilter2 = rd_f32();
    params::curbPoints = rd_i32();
    const int do_x = rd_i32(), do_z = rd_i32();

    if (do_x) det.xZeroMethod(a3, index, cnt.data());
    if (do_z) det.zZeroMethod(a3, index, cnt.data());

    for (int k = 0; k < index; k++) {
      std::vector<int> out(cnt[k]);
      for (int j = 0; j < cnt[k]; j++) out[j] = a3[k][j].isCurbPoint;
      wr(out.data(), 4ul * cnt[k]);
    }
    return 0;
  }

  if (mode == "blind") {
    for (int k = 0; k < index; k++) {
      const int c = cnt[k];
      std::vector<float> ba(c);
      std::vector<int> bl(c);
      rd(ba.data(), 4ul * c);
      rd(bl.data(), 4ul * c);
      for (int j = 0; j < c; j++) {
        a3[k][j].alpha = ba[j];
        a3[k][j].isCurbPoint = (short)bl[j];
      }
      // One-past slack slot: alpha 0 / label 0, like the reference's
      // value-initialized rows.
    }
    std::vector<float> maxd(index > 64 ? index : 64, 0.0f);
    rd(maxd.data(), 4ul * index);
    params::beamZone = rd_f32();
    params::xDirection = rd_i32();
    params::blind_spots = rd_i32() != 0;

    det.blindSpots(a3, index, cnt.data(), maxd.data());

    for (int k = 0; k < index; k++) {
      std::vector<int> out(cnt[k]);
      for (int j = 0; j < cnt[k]; j++) out[j] = a3[k][j].isCurbPoint;
      wr(out.data(), 4ul * cnt[k]);
    }
    return 0;
  }

  std::fprintf(stderr, "golden_harness: unknown mode %s\n", mode.c_str());
  return 2;
}
