// Reference-numerics oracle: compiles the UNMODIFIED reference sources
// (/root/reference/src/mapping/factors.cpp and
// /root/reference/src/estimation/imu_preintegration.cpp, linked by the
// Makefile) against minimal PCL/ROS stand-ins (csrc/stubs/) and evaluates
// them on fixtures, so tests/test_reference_oracle.py can cross-check the
// JAX kernels against the reference implementation itself — killing the
// correlated-oracle risk of same-author Python reimplementations.
//
// Modes (fixture = whitespace-separated doubles on the file in argv[2]):
//   oracle lidar  <fix>   LidarFactor::evaluate_only_residual +
//                         acc_evaluate2 (factors.cpp:22-168)
//   oracle normal <fix>   NormalFactor::acc_evaluate2 (factors.cpp:185-304)
//   oracle preint <fix>   IMU_PRE::push_imu + give_evaluate[_g]
//                         (imu_preintegration.cpp:31-237)
//
// Output: one double per line via printf("%.17g").

#include <cstdio>
#include <cstring>
#include <deque>
#include <vector>

#include "vina_slam/mapping/factors.hpp"
#include "vina_slam/preintegration.hpp"

namespace {

double rd(FILE* f) {
  double x = 0;
  if (fscanf(f, "%lf", &x) != 1) {
    fprintf(stderr, "oracle: fixture underflow\n");
    exit(2);
  }
  return x;
}

Eigen::Vector3d rd3(FILE* f) {
  Eigen::Vector3d v;
  for (int i = 0; i < 3; i++) v[i] = rd(f);
  return v;
}

Eigen::Matrix3d rd33(FILE* f) {  // row-major
  Eigen::Matrix3d m;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) m(i, j) = rd(f);
  return m;
}

IMUST rd_state(FILE* f) {
  IMUST s;
  s.t = rd(f);
  s.R = rd33(f);
  s.p = rd3(f);
  s.v = rd3(f);
  s.bg = rd3(f);
  s.ba = rd3(f);
  s.g = rd3(f);
  return s;
}

PointCluster rd_cluster(FILE* f) {
  PointCluster c;
  c.P = rd33(f);
  c.v = rd3(f);
  c.N = static_cast<int>(rd(f));
  return c;
}

void emit(double x) { printf("%.17g\n", x); }

void emit_vec(const Eigen::VectorXd& v) {
  for (int i = 0; i < v.size(); i++) emit(v[i]);
}

void emit_mat(const Eigen::MatrixXd& m) {  // row-major
  for (int i = 0; i < m.rows(); i++)
    for (int j = 0; j < m.cols(); j++) emit(m(i, j));
}

int run_lidar(FILE* f, bool normal_mode) {
  const int W = static_cast<int>(rd(f));
  const int V = static_cast<int>(rd(f));
  std::vector<IMUST> xs(W);
  for (int i = 0; i < W; i++) xs[i] = rd_state(f);

  LidarFactor lf(W);
  NormalFactor nf(W);
  for (int a = 0; a < V; a++) {
    double coe = rd(f);
    Eigen::Vector3d n_ref = rd3(f);
    PointCluster fix = rd_cluster(f);
    std::vector<PointCluster> per(W);
    for (int i = 0; i < W; i++) per[i] = rd_cluster(f);
    Eigen::Vector3d ev = Eigen::Vector3d::Zero();
    Eigen::Matrix3d eV = Eigen::Matrix3d::Identity();
    PointCluster add;
    if (normal_mode)
      nf.push_voxel(per, fix, coe, n_ref, add);
    else
      lf.push_voxel(per, fix, coe, ev, eV, add);
  }

  Eigen::MatrixXd Hess(6 * W, 6 * W);
  Eigen::VectorXd JacT(6 * W);
  double residual = 0;
  if (normal_mode) {
    nf.acc_evaluate2(xs, 0, V, Hess, JacT, residual);
  } else {
    double res0 = 0;
    // refresh the cached eig state the way the reference LM loop does
    // (evaluate_only_residual before acc_evaluate2, optimizers.cpp)
    lf.evaluate_only_residual(xs, 0, V, res0);
    lf.acc_evaluate2(xs, 0, V, Hess, JacT, residual);
  }
  emit(residual);
  emit_vec(JacT);
  emit_mat(Hess);
  return 0;
}

int run_preint(FILE* f) {
  noiseMeas = Eigen::Matrix<double, 6, 6>::Zero();
  noiseWalk = Eigen::Matrix<double, 6, 6>::Zero();
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < 6; j++) noiseMeas(i, j) = rd(f);
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < 6; j++) noiseWalk(i, j) = rd(f);
  imupre_scale_gravity = rd(f);

  Eigen::Vector3d bg = rd3(f);
  Eigen::Vector3d ba = rd3(f);
  IMU_PRE pre(bg, ba);

  const int n = static_cast<int>(rd(f));
  std::deque<sensor_msgs::msg::Imu::SharedPtr> buf;
  for (int i = 0; i < n; i++) {
    auto m = std::make_shared<sensor_msgs::msg::Imu>();
    double t = rd(f);
    m->header.stamp.sec = static_cast<int32_t>(t);
    m->header.stamp.nanosec =
        static_cast<uint32_t>((t - m->header.stamp.sec) * 1e9 + 0.5);
    Eigen::Vector3d g = rd3(f), a = rd3(f);
    m->angular_velocity.x = g[0];
    m->angular_velocity.y = g[1];
    m->angular_velocity.z = g[2];
    m->linear_acceleration.x = a[0];
    m->linear_acceleration.y = a[1];
    m->linear_acceleration.z = a[2];
    buf.push_back(m);
  }
  pre.push_imu(buf);
  pre.dbg = rd3(f);
  pre.dba = rd3(f);

  IMUST st1 = rd_state(f);
  IMUST st2 = rd_state(f);

  Eigen::MatrixXd jtj(2 * DIM, 2 * DIM);
  Eigen::VectorXd gg(2 * DIM);
  double res = pre.give_evaluate(st1, st2, jtj, gg, true);
  emit(res);
  emit_vec(gg);
  emit_mat(jtj);

  Eigen::MatrixXd jtjg(2 * DIM + 3, 2 * DIM + 3);
  Eigen::VectorXd ggg(2 * DIM + 3);
  double resg = pre.give_evaluate_g(st1, st2, jtjg, ggg, true);
  emit(resg);
  emit_vec(ggg);
  emit_mat(jtjg);
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    fprintf(stderr, "usage: oracle {lidar|normal|preint} <fixture>\n");
    return 2;
  }
  FILE* f = fopen(argv[2], "r");
  if (!f) {
    fprintf(stderr, "oracle: cannot open %s\n", argv[2]);
    return 2;
  }
  if (!strcmp(argv[1], "lidar")) return run_lidar(f, false);
  if (!strcmp(argv[1], "normal")) return run_lidar(f, true);
  if (!strcmp(argv[1], "preint")) return run_preint(f);
  fprintf(stderr, "oracle: unknown mode %s\n", argv[1]);
  return 2;
}
