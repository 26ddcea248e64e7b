// SHADOW of the reference's vina_slam/lidar_pointcloud_decoder.hpp for the
// headless refpipe build (-I stubs precedes -I $(REF)/include): the vendor
// decode path needs livox_ros_driver2 / PCL registration machinery that is
// deliberately out of scope — the harness injects DECODED clouds straight
// into the sync buffers (decoder parity is covered separately by
// csrc/decode.cpp + tests/test_sensor.py). Only the surface node.cpp /
// sync.cpp touch survives: the LID_TYPE enum, a parameter-holding
// LidarPointCloudDecoder, the handler declarations, and a minimal livox
// CustomMsg so node.cpp's (never-invoked) subscription lambda compiles.
#pragma once

#include <cstdint>
#include <memory>
#include <vector>

#include <pcl/point_cloud.h>
#include <pcl/point_types.h>
#include <sensor_msgs/msg/imu.hpp>
#include <std_msgs/msg/header.hpp>

using PointType = pcl::PointXYZINormal;

enum LID_TYPE
{
  LIVOX,
  VELODYNE,
  OUSTER,
  HESAI,
  ROBOSENSE,
  TARTANAIR
};

namespace livox_ros_driver2 {
namespace msg {
struct CustomPoint {
  uint32_t offset_time = 0;
  float x = 0, y = 0, z = 0;
  uint8_t reflectivity = 0, tag = 0, line = 0;
};
struct CustomMsg {
  using SharedPtr = std::shared_ptr<CustomMsg>;
  std_msgs::msg::Header header;
  uint64_t timebase = 0;
  uint32_t point_num = 0;
  std::vector<CustomPoint> points;
};
}  // namespace msg
}  // namespace livox_ros_driver2

class LidarPointCloudDecoder
{
public:
  int lidar_type = 0;
  double blind = 0.1;
  int point_filter_num = 1;
};

// Handlers: imu_handler is the real one (subscribers.cpp); the pcl decode
// handler is a no-op here — the harness fills pcl_buf/time_buf directly.
void imu_handler(const std::shared_ptr<sensor_msgs::msg::Imu>& msg_in);

template <class T>
inline void pcl_handler(T&)
{
}
