// Minimal PointCloud2 stand-in: the headless build never serializes point
// data (toROSMsg is a no-op), only the header fields are touched.
#pragma once

#include <cstdint>
#include <memory>
#include <string>
#include <vector>

#include "std_msgs/msg/header.hpp"

namespace sensor_msgs {
namespace msg {
struct PointCloud2 {
  using SharedPtr = std::shared_ptr<PointCloud2>;
  std_msgs::msg::Header header;
  uint32_t height = 0, width = 0;
  bool is_bigendian = false;
  uint32_t point_step = 0, row_step = 0;
  std::vector<uint8_t> data;
};
}  // namespace msg
}  // namespace sensor_msgs
