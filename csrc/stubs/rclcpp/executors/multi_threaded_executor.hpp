#pragma once
#include <memory>

#include "rclcpp/node.hpp"

namespace rclcpp {
namespace executors {
class MultiThreadedExecutor {
 public:
  using SharedPtr = std::shared_ptr<MultiThreadedExecutor>;
  void add_node(const Node::SharedPtr&) {}
  void spin() {}
};
}  // namespace executors
}  // namespace rclcpp
