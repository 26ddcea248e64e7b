#pragma once
#include <memory>

namespace tf2_ros {
class TransformBroadcaster {
 public:
  template <class NodeT>
  explicit TransformBroadcaster(const NodeT&) {}
  template <class MsgT>
  void sendTransform(const MsgT&) {}
};
}  // namespace tf2_ros
