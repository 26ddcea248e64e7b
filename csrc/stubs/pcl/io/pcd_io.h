#pragma once
#include <string>

namespace pcl {
namespace io {
// Headless build: map saving is exercised by the Python platform layer
// (vina_slam_tpu/platform/io.py); the reference call becomes a no-op.
template <class CloudT>
inline int savePCDFileBinary(const std::string&, const CloudT&) {
  return 0;
}
}  // namespace io
}  // namespace pcl
