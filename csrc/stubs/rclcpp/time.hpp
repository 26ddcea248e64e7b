// Minimal rclcpp::Time stand-in: converts a {sec, nanosec} stamp to seconds.
#pragma once

#include <cstdint>

namespace rclcpp {

class Time {
  double s_;
  int64_t ns_;

 public:
  template <class Stamp>
  explicit Time(const Stamp& st)
      : s_(static_cast<double>(st.sec) + 1e-9 * static_cast<double>(st.nanosec)),
        ns_(static_cast<int64_t>(st.sec) * 1000000000 +
            static_cast<int64_t>(st.nanosec)) {}
  explicit Time(int64_t ns) : s_(static_cast<double>(ns) * 1e-9), ns_(ns) {}
  double seconds() const { return s_; }
  int64_t nanoseconds() const { return ns_; }
};

}  // namespace rclcpp
