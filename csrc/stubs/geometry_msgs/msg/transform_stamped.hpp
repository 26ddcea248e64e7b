#pragma once
#include <string>

#include "std_msgs/msg/header.hpp"

namespace geometry_msgs {
namespace msg {
struct TransformStamped {
  std_msgs::msg::Header header;
  std::string child_frame_id;
  struct {
    Vector3 translation;
    Quaternion rotation;
  } transform;
};
}  // namespace msg
}  // namespace geometry_msgs
