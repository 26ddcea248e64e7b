// Shared std_msgs/geometry_msgs stand-ins for the oracle stubs (used by
// both sensor_msgs/msg/imu.hpp and visualization_msgs/msg/marker_array.hpp).
#pragma once

#include <cstdint>
#include <string>
#include <utility>

namespace builtin_interfaces {
namespace msg {
struct Time {
  int32_t sec = 0;
  uint32_t nanosec = 0;
  Time() = default;
  // accept assignment from rclcpp::Time (anything exposing nanoseconds()),
  // used by IMUEKF::motion_blur's deque-boundary stamp rewrite
  template <class T, class = decltype(std::declval<T>().nanoseconds())>
  Time& operator=(const T& t) {
    int64_t ns = t.nanoseconds();
    sec = static_cast<int32_t>(ns / 1000000000);
    nanosec = static_cast<uint32_t>(ns % 1000000000);
    return *this;
  }
};
}  // namespace msg
}  // namespace builtin_interfaces

namespace std_msgs {
namespace msg {
struct Header {
  builtin_interfaces::msg::Time stamp;
  std::string frame_id;
};
struct ColorRGBA {
  float r = 0, g = 0, b = 0, a = 0;
};
}  // namespace msg
}  // namespace std_msgs

namespace geometry_msgs {
namespace msg {
struct Point {
  double x = 0, y = 0, z = 0;
};
struct Quaternion {
  double x = 0, y = 0, z = 0, w = 1;
};
struct Pose {
  Point position;
  Quaternion orientation;
};
struct Vector3 {
  double x = 0, y = 0, z = 0;
};
}  // namespace msg
}  // namespace geometry_msgs
