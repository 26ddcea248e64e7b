// Minimal sensor_msgs::msg::Imu stand-in with the fields IMU_PRE::push_imu
// reads (header.stamp, angular_velocity, linear_acceleration).
#pragma once

#include <cstdint>
#include <memory>
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
};
}  // namespace msg
}  // namespace std_msgs

namespace geometry_msgs {
namespace msg {
struct Vector3 {
  double x = 0, y = 0, z = 0;
};
}  // namespace msg
}  // namespace geometry_msgs

namespace sensor_msgs {
namespace msg {
struct Imu {
  using SharedPtr = std::shared_ptr<Imu>;
  std_msgs::msg::Header header;
  geometry_msgs::msg::Vector3 angular_velocity;
  geometry_msgs::msg::Vector3 linear_acceleration;
};
}  // namespace msg
}  // namespace sensor_msgs
