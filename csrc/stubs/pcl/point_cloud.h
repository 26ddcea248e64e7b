// Minimal pcl::PointCloud stand-in (vector-backed) for compiling the
// reference math sources without PCL.
#pragma once

#include <cstddef>
#include <cstdint>
#include <memory>
#include <vector>

namespace pcl {

template <class P>
struct PointCloud {
  using Ptr = std::shared_ptr<PointCloud<P>>;
  std::vector<P> points;
  std::uint32_t height = 0, width = 0;

  std::size_t size() const { return points.size(); }
  bool empty() const { return points.empty(); }
  void clear() { points.clear(); }
  void reserve(std::size_t n) { points.reserve(n); }
  void resize(std::size_t n) { points.resize(n); }
  void push_back(const P& p) { points.push_back(p); }
  void swap(PointCloud<P>& other) { points.swap(other.points); }
  P& back() { return points.back(); }
  const P& back() const { return points.back(); }
  P& operator[](std::size_t i) { return points[i]; }
  const P& operator[](std::size_t i) const { return points[i]; }
  P& at(std::size_t i) { return points.at(i); }
  typename std::vector<P>::iterator begin() { return points.begin(); }
  typename std::vector<P>::iterator end() { return points.end(); }
  typename std::vector<P>::const_iterator begin() const { return points.begin(); }
  typename std::vector<P>::const_iterator end() const { return points.end(); }
};

}  // namespace pcl
