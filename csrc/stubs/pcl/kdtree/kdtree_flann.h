// Brute-force stand-in for pcl::KdTreeFLANN, used only by the reference's
// kdtree-bootstrap odometry (odometry.cpp:267-439) during initialization.
// Exact k-NN by linear scan + partial sort — identical results to FLANN's
// exact mode, O(N) per query (fine at bootstrap cloud sizes, <= ~65k pts).
#pragma once

#include <algorithm>
#include <cmath>
#include <vector>

#include "pcl/point_cloud.h"

namespace pcl {

template <class P>
class KdTreeFLANN {
  typename PointCloud<P>::Ptr cloud_;

 public:
  void setInputCloud(const typename PointCloud<P>::Ptr& cloud) {
    cloud_ = cloud;
  }

  int nearestKSearch(const P& q, int k, std::vector<int>& idx,
                     std::vector<float>& sqdist) const {
    idx.clear();
    sqdist.clear();
    if (!cloud_ || cloud_->points.empty() || k <= 0) return 0;
    const auto& pts = cloud_->points;
    const int n = static_cast<int>(pts.size());
    k = std::min(k, n);
    std::vector<std::pair<float, int>> d(n);
    for (int i = 0; i < n; i++) {
      const float dx = pts[i].x - q.x, dy = pts[i].y - q.y,
                  dz = pts[i].z - q.z;
      d[i] = {dx * dx + dy * dy + dz * dz, i};
    }
    std::partial_sort(d.begin(), d.begin() + k, d.end());
    idx.reserve(k);
    sqdist.reserve(k);
    for (int i = 0; i < k; i++) {
      sqdist.push_back(d[i].first);
      idx.push_back(d[i].second);
    }
    return k;
  }
};

}  // namespace pcl
