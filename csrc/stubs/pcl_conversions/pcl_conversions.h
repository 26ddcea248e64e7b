#pragma once

// No-op pcl <-> ROS conversions for the headless build (publishers are
// stubs; nothing consumes the serialized bytes).
namespace pcl {
template <class CloudT, class MsgT>
inline void toROSMsg(const CloudT&, MsgT&) {}
template <class MsgT, class CloudT>
inline void fromROSMsg(const MsgT&, CloudT&) {}
}  // namespace pcl
