// Minimal ROS stub for compiling the reference verbatim.  The original
// 3-mode harness only needs the type names in data_structures.hpp; the
// `full` harness additionally drives Detector::filtered end-to-end, so
// Publisher::publish captures messages through an ADL hook
// (`golden_capture`, defined per message type in the message stubs and
// implemented by tools/golden/golden_full.cpp).
#pragma once
#include <string>

namespace ros {
struct Time {};
struct Duration {
  explicit Duration(double = 0.0) {}
};
struct Subscriber {};
struct Publisher {
  std::string topic;
  template <typename T>
  void publish(const T& msg) const {
    golden_capture(topic, msg);  // ADL: resolved in the message's namespace
  }
};
struct NodeHandle {
  template <typename M, typename T>
  Subscriber subscribe(const std::string&, int, void (T::*)(const M&), T*) {
    return {};
  }
  template <typename M>
  Publisher advertise(const std::string& topic, int) {
    return Publisher{topic};
  }
};
}  // namespace ros

#ifndef ROS_INFO
#define ROS_INFO(...) ((void)0)
#endif
