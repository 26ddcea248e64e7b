// Headless replay of the REFERENCE pipeline (test infrastructure, same
// pattern as oracle.cpp): links the UNMODIFIED reference sources —
// pipeline/{odometry,initialization,local_mapping}.cpp,
// platform/ros2/{node,io,publishers,subscribers}.cpp, sensor/sync.cpp and
// the mapping/estimation stack — against the minimal stubs in stubs/, feeds
// them the SAME synthetic frames the JAX runner consumes, and lets the
// reference's own main loop (thd_odometry_localmapping) write its TUM
// trajectory via FileReaderWriter. scripts/ref_replay.py drives this binary
// and scores ours-vs-reference ATE (BASELINE.md's actual accuracy metric).
//
// Input event file (written by scripts/ref_replay.py):
//   magic "VREF1\n"
//   records until EOF:
//     'I' f64 t, f64 gyr[3], f64 acc[3]          (acc in g-units, like the
//                                                 live Livox topic)
//     'S' f64 stamp, i32 n, n * f32[4] {x,y,z,rel_time}
// Param file: lines "<name> <int|double|str|vec> <value>"; vec is
// comma-separated doubles.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "vina_slam/platform/ros2/node.hpp"
#include "vina_slam/platform/ros2/publishers.hpp"
#include "vina_slam/platform/ros2/subscribers.hpp"
#include "vina_slam/platform/ros2/io.hpp"
#include "vina_slam/pipeline/initialization.hpp"
#include "vina_slam/sensor/sync.hpp"

// stub-surface globals the linked objects expect
bool (*rclcpp::g_finish_hook)() = nullptr;
int64_t g_oracle_clock_calls = 0;

static bool finish_when_drained() { return pcl_buf.empty(); }

static void set_stamp(std_msgs::msg::Header& h, double t) {
  h.stamp.sec = static_cast<int32_t>(t);
  h.stamp.nanosec = static_cast<uint32_t>((t - static_cast<int32_t>(t)) * 1e9);
}

static int load_events(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) {
    std::fprintf(stderr, "cannot open events %s\n", path);
    return -1;
  }
  char magic[6];
  f.read(magic, 6);
  if (std::memcmp(magic, "VREF1\n", 6) != 0) {
    std::fprintf(stderr, "bad magic\n");
    return -1;
  }
  int n_imu = 0, n_scan = 0;
  char kind;
  while (f.read(&kind, 1)) {
    if (kind == 'I') {
      double t, g[3], a[3];
      f.read(reinterpret_cast<char*>(&t), 8);
      f.read(reinterpret_cast<char*>(g), 24);
      f.read(reinterpret_cast<char*>(a), 24);
      auto msg = std::make_shared<sensor_msgs::msg::Imu>();
      set_stamp(msg->header, t);
      msg->angular_velocity.x = g[0];
      msg->angular_velocity.y = g[1];
      msg->angular_velocity.z = g[2];
      msg->linear_acceleration.x = a[0];
      msg->linear_acceleration.y = a[1];
      msg->linear_acceleration.z = a[2];
      imu_handler(msg);  // the reference's own buffering path
      n_imu++;
    } else if (kind == 'S') {
      double stamp;
      int32_t n;
      f.read(reinterpret_cast<char*>(&stamp), 8);
      f.read(reinterpret_cast<char*>(&n), 4);
      auto pl = std::make_shared<pcl::PointCloud<PointType>>();
      pl->reserve(n);
      std::vector<float> buf(static_cast<size_t>(n) * 4);
      f.read(reinterpret_cast<char*>(buf.data()), n * 16);
      for (int32_t i = 0; i < n; i++) {
        PointType p;
        p.x = buf[i * 4 + 0];
        p.y = buf[i * 4 + 1];
        p.z = buf[i * 4 + 2];
        p.curvature = buf[i * 4 + 3];  // rel time, decoder convention
        pl->push_back(p);
      }
      pcl_buf.push_back(pl);
      time_buf.push_back(stamp);
      n_scan++;
    } else {
      std::fprintf(stderr, "bad record kind %c\n", kind);
      return -1;
    }
  }
  std::fprintf(stderr, "[refpipe] loaded %d imu, %d scans\n", n_imu, n_scan);
  return 0;
}

static int load_params(const char* path, rclcpp::Node::SharedPtr node) {
  std::ifstream f(path);
  if (!f) {
    std::fprintf(stderr, "cannot open params %s\n", path);
    return -1;
  }
  std::string name, type;
  while (f >> name >> type) {
    if (type == "int") {
      int v;
      f >> v;
      node->set_param(name, v);
    } else if (type == "double") {
      double v;
      f >> v;
      node->set_param(name, v);
    } else if (type == "str") {
      std::string v;
      f >> v;
      node->set_param(name, v);
    } else if (type == "vec") {
      std::string csv;
      f >> csv;
      std::vector<double> v;
      std::stringstream ss(csv);
      std::string item;
      while (std::getline(ss, item, ',')) v.push_back(std::stod(item));
      node->set_param(name, v);
    } else {
      std::fprintf(stderr, "bad param type %s\n", type.c_str());
      return -1;
    }
  }
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: refpipe <events.bin> <params.txt>\n");
    return 2;
  }
  rclcpp::init(argc, argv);
  auto node = std::make_shared<rclcpp::Node>("vina_slam");
  if (load_params(argv[2], node) != 0) return 1;
  if (load_events(argv[1]) != 0) return 1;
  rclcpp::g_finish_hook = &finish_when_drained;

  // mirror the reference main() setup order (node.cpp:395-430)
  pub_cmap = node->create_publisher<sensor_msgs::msg::PointCloud2>("/map_cmap", 100);
  pub_scan = node->create_publisher<sensor_msgs::msg::PointCloud2>("/map_scan", 100);
  pub_curr_path = node->create_publisher<sensor_msgs::msg::PointCloud2>("/map_path", 100);
  pub_voxel_plane = node->create_publisher<visualization_msgs::msg::MarkerArray>("/voxel_plane", 10);
  pub_voxel_normal = node->create_publisher<visualization_msgs::msg::MarkerArray>("/voxel_normal", 10);

  ResultOutput::instance(node);
  FileReaderWriter::instance(node);
  Initialization::instance(node);
  VINA_SLAM vs(node);

  mp.resize(vs.win_size);
  for (size_t i = 0; i < mp.size(); i++) mp[i] = i;

  vs.thd_odometry_localmapping(node);
  std::fprintf(stderr, "[refpipe] done\n");
  return 0;
}
