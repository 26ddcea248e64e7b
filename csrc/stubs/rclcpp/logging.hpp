// No-op (stderr) logging macros for the headless reference build.
#pragma once

#include <cstdio>

#define RCLCPP_DEBUG(logger, ...) \
  do {                            \
  } while (0)
#define RCLCPP_INFO(logger, ...)               \
  do {                                         \
    std::fprintf(stderr, "[ref-info] " __VA_ARGS__); \
    std::fprintf(stderr, "\n");                \
  } while (0)
#define RCLCPP_WARN(logger, ...)               \
  do {                                         \
    std::fprintf(stderr, "[ref-warn] " __VA_ARGS__); \
    std::fprintf(stderr, "\n");                \
  } while (0)
#define RCLCPP_ERROR(logger, ...)              \
  do {                                         \
    std::fprintf(stderr, "[ref-err ] " __VA_ARGS__); \
    std::fprintf(stderr, "\n");                \
  } while (0)
