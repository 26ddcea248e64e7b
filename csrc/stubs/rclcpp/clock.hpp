#pragma once

// Minimal stand-in for rclcpp::Clock, used by the reference LM driver
// (src/mapping/optimizers.cpp) only for wall-clock stage timing. The
// construction counter lets the oracle report how many timing probes ran
// — 2 per Hessian evaluation + 2 per LM iteration (optimizers.cpp:454-484)
// — which pins the reference's accept/reject/break trajectory from the
// outside without modifying its source.

#include <cstdint>

extern int64_t g_oracle_clock_calls;

namespace rclcpp {

class Clock {
 public:
  struct Stamp {
    double s_;
    double seconds() const { return s_; }
  };
  Stamp now() {
    ++g_oracle_clock_calls;
    return Stamp{0.0};
  }
};

}  // namespace rclcpp
