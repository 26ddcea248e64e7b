// Minimal PCL stand-in so the reference math sources compile WITHOUT PCL.
// Mirrors the real pcl::PointXYZINormal field layout (x/y/z aliased by
// data[4], normals aliased by normal[4]) that point_utils.hpp touches.
#pragma once

namespace pcl {

struct PointXYZI {
  union {
    struct {
      float x, y, z;
    };
    float data[4];
  };
  float intensity;

  PointXYZI() : data{0, 0, 0, 1}, intensity(0) {}
};

struct PointXYZINormal {
  union {
    struct {
      float x, y, z;
    };
    float data[4];
  };
  float intensity;
  union {
    struct {
      float normal_x, normal_y, normal_z;
    };
    float normal[4];
  };
  float curvature;

  PointXYZINormal()
      : data{0, 0, 0, 1}, intensity(0), normal{0, 0, 0, 0}, curvature(0) {}
};

}  // namespace pcl
