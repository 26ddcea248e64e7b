// Satisfies subscribers.hpp's include; the CustomMsg type itself lives in
// the shadowed vina_slam/lidar_pointcloud_decoder.hpp.
#pragma once
#include <vina_slam/lidar_pointcloud_decoder.hpp>
