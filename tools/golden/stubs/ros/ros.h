// Minimal ROS stub: just enough for data_structures.hpp's class declaration
// (NodeHandle*/Publisher/Subscriber members are never exercised by the four
// algorithm translation units the golden harness links).
#pragma once
namespace ros {
struct NodeHandle {};
struct Publisher {};
struct Subscriber {};
}  // namespace ros
