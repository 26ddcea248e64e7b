// Minimal visualization_msgs stand-in so the UNMODIFIED reference
// src/mapping/octree.cpp (which renders plane/normal markers for RViz)
// compiles into the numerics oracle. Field set = exactly what
// octree.cpp:collect_{plane,normal}_markers touches.
#pragma once

#include <cstdint>
#include <string>
#include <vector>

#include "std_msgs/msg/header.hpp"

namespace visualization_msgs {
namespace msg {
struct Marker {
  enum Type : int32_t { ARROW = 0, CUBE = 1, SPHERE = 2, CYLINDER = 3 };
  enum Action : int32_t { ADD = 0, MODIFY = 0, DELETE = 2, DELETEALL = 3 };
  std_msgs::msg::Header header;
  std::string ns;
  int32_t id = 0;
  int32_t type = 0;
  int32_t action = 0;
  geometry_msgs::msg::Pose pose;
  geometry_msgs::msg::Vector3 scale;
  std_msgs::msg::ColorRGBA color;
  std::vector<geometry_msgs::msg::Point> points;
};
struct MarkerArray {
  std::vector<Marker> markers;
};
}  // namespace msg
}  // namespace visualization_msgs
