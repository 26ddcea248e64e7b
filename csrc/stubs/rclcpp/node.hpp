// Minimal rclcpp::Node stand-in for compiling the reference PIPELINE
// sources (node.cpp, local_mapping.cpp, odometry.cpp, initialization.cpp)
// headless: a typed parameter store, wall-clock now(), no-op logging, and
// no-op publisher/subscription factories. Everything the reference reads
// from ROS parameters is preloaded by the refpipe harness via
// Node::set_param before construction.
#pragma once

#include <cstdint>
#include <chrono>
#include <map>
#include <memory>
#include <string>
#include <variant>
#include <vector>

#include "rclcpp/clock.hpp"
#include "rclcpp/logging.hpp"
#include "rclcpp/time.hpp"

namespace rclcpp {

class Logger {
 public:
  explicit Logger(const std::string& name = "stub") : name_(name) {}
  std::string name_;
};

inline Logger get_logger(const std::string& name = "stub") {
  return Logger(name);
}

class QoS {
 public:
  explicit QoS(size_t = 10) {}
  QoS& keep_last(size_t) { return *this; }
  QoS& best_effort() { return *this; }
};

class SensorDataQoS : public QoS {
 public:
  SensorDataQoS() : QoS(5) {}
};

template <class Msg>
class Publisher {
 public:
  using SharedPtr = std::shared_ptr<Publisher<Msg>>;
  void publish(const Msg&) {}
};

template <class Msg>
class Subscription {
 public:
  using SharedPtr = std::shared_ptr<Subscription<Msg>>;
};

// The refpipe harness installs this to drive the reference main loop's
// `node->get_parameter("finish", is_finish)` poll: return true once the
// input bags are drained so thd_odometry_localmapping exits cleanly.
extern bool (*g_finish_hook)();

class Node {
 public:
  using SharedPtr = std::shared_ptr<Node>;
  using Param = std::variant<bool, int, double, std::string,
                             std::vector<double>>;

  explicit Node(const std::string& name = "stub") : name_(name) {}

  // ---- parameter store ----
  std::map<std::string, Param> params_;

  template <class T>
  void set_param(const std::string& k, const T& v) {
    params_[k] = Param(v);
  }

  bool has_parameter(const std::string& k) const {
    return params_.count(k) != 0;
  }

  // One template covers both spellings in node.cpp: the deduced form
  // (declare_parameter("Odometry.cov_gyr", 0.1)) and the explicit form
  // with a convertible default (declare_parameter<int>("...", false)).
  template <class T = void, class D>
  auto declare_parameter(const std::string& k, const D& dflt) {
    using U = std::conditional_t<std::is_void_v<T>, D, T>;
    U d{};
    if constexpr (std::is_same_v<U, D>) {
      d = dflt;
    } else {
      d = static_cast<U>(dflt);
    }
    auto it = params_.find(k);
    if (it == params_.end()) {
      params_[k] = Param(d);
      return d;
    }
    return get_as<U>(it->second, d);
  }

  std::string declare_parameter(const std::string& k, const char* dflt) {
    return declare_parameter<std::string>(k, std::string(dflt));
  }

  template <class T>
  bool get_parameter(const std::string& k, T& out) const {
    if (k == "finish" && g_finish_hook) {
      set_bool(out, g_finish_hook());
      return true;
    }
    auto it = params_.find(k);
    if (it == params_.end()) return false;
    out = get_as<T>(it->second, out);
    return true;
  }

  // ---- time / logging ----
  Time now() const {
    auto ns = std::chrono::duration_cast<std::chrono::nanoseconds>(
                  std::chrono::steady_clock::now().time_since_epoch())
                  .count();
    return Time(static_cast<int64_t>(ns));
  }

  Logger get_logger() const { return Logger(name_); }

  // ---- factories ----
  template <class Msg, class QoST>
  typename Publisher<Msg>::SharedPtr create_publisher(const std::string&,
                                                      const QoST&) {
    return std::make_shared<Publisher<Msg>>();
  }

  template <class Msg, class QoST, class CB>
  typename Subscription<Msg>::SharedPtr create_subscription(
      const std::string&, const QoST&, CB&&) {
    return std::make_shared<Subscription<Msg>>();
  }

 private:
  template <class T>
  static T get_as(const Param& p, const T& dflt) {
    if (auto* v = std::get_if<T>(&p)) return *v;
    // numeric cross-conversions (int param read as double and vice versa)
    if constexpr (std::is_arithmetic_v<T>) {
      if (auto* d = std::get_if<double>(&p)) return static_cast<T>(*d);
      if (auto* i = std::get_if<int>(&p)) return static_cast<T>(*i);
      if (auto* b = std::get_if<bool>(&p)) return static_cast<T>(*b);
    }
    return dflt;
  }

  template <class T>
  static void set_bool(T& out, bool v) {
    out = static_cast<T>(v);
  }
  static void set_bool(std::string&, bool) {}

  std::string name_;
};

inline void init(int, char**) {}
inline bool ok() { return true; }

}  // namespace rclcpp
