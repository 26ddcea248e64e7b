// Minimal sensor_msgs::msg::Imu stand-in with the fields IMU_PRE::push_imu
// reads (header.stamp, angular_velocity, linear_acceleration).
#pragma once

#include <memory>

#include "std_msgs/msg/header.hpp"

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
