// Minimal rclcpp::Time stand-in: converts a {sec, nanosec} stamp to seconds.
#pragma once

#include <cstdint>

namespace rclcpp {

class Time {
  double s_;

 public:
  template <class Stamp>
  explicit Time(const Stamp& st)
      : s_(static_cast<double>(st.sec) + 1e-9 * static_cast<double>(st.nanosec)) {}
  double seconds() const { return s_; }
};

}  // namespace rclcpp
