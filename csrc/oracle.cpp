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
//   oracle iekf   <fix>   one VNC-IEKF iteration's solver math
//                         (odometry.cpp:100-207, transliterated here)
//   oracle ekf    <fix>   IMUEKF::motion_blur propagation + deskew
//                         (imu_ekf.cpp:13-148)
//   oracle lm     <fix>   LI_BA_Optimizer::damping_iter — the full
//                         windowed-BA LM loop (optimizers.cpp:430-517)
//   oracle lmg    <fix>   LI_BA_OptimizerGravity::damping_iter
//                         (optimizers.cpp:746-826)
//
// Output: one double per line via printf("%.17g").

#include <cmath>
#include <cstdio>
#include <cstring>
#include <deque>
#include <vector>

#include "vina_slam/ekf_imu.hpp"
#include "vina_slam/mapping/factors.hpp"
#include "vina_slam/mapping/optimizers.hpp"
#include "vina_slam/mapping/voxel_map.hpp"
#include "vina_slam/preintegration.hpp"

// timing-probe counter incremented by the rclcpp::Clock stub
// (csrc/stubs/rclcpp/clock.hpp); 2 per Hessian eval + 2 per LM iteration
int64_t g_oracle_clock_calls = 0;

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

int run_ekf(FILE* f) {
  // IMUEKF::motion_blur (imu_ekf.cpp:13-148) COMPILED FROM THE REFERENCE
  // SOURCE: forward propagation (state + DIM covariance over the IMU
  // midpoint intervals), terminal extrapolation to pcl_end_time, and the
  // backward per-point deskew through the pose table. Fixture supplies the
  // EKF driver state the surrounding node normally maintains.
  IMUEKF ekf;
  ekf.scale_gravity = rd(f);
  ekf.cov_gyr = rd3(f);
  ekf.cov_acc = rd3(f);
  ekf.cov_bias_gyr = rd3(f);
  ekf.cov_bias_acc = rd3(f);
  ekf.Lid_rot_to_IMU = rd33(f);
  ekf.Lid_offset_to_IMU = rd3(f);
  ekf.pcl_beg_time = rd(f);
  ekf.pcl_end_time = rd(f);
  ekf.last_pcl_end_time = rd(f);
  ekf.point_notime = 0;
  ekf.init_flag = true;

  IMUST xc = rd_state(f);
  for (int i = 0; i < DIM; i++)
    for (int j = 0; j < DIM; j++) xc.cov(i, j) = rd(f);

  auto mk_imu = [&](FILE* ff) {
    auto m = std::make_shared<sensor_msgs::msg::Imu>();
    double t = rd(ff);
    m->header.stamp.sec = static_cast<int32_t>(t);
    m->header.stamp.nanosec =
        static_cast<uint32_t>((t - m->header.stamp.sec) * 1e9 + 0.5);
    Eigen::Vector3d g = rd3(ff), a = rd3(ff);
    m->angular_velocity.x = g[0];
    m->angular_velocity.y = g[1];
    m->angular_velocity.z = g[2];
    m->linear_acceleration.x = a[0];
    m->linear_acceleration.y = a[1];
    m->linear_acceleration.z = a[2];
    return m;
  };
  ekf.last_imu = mk_imu(f);  // motion_blur push_front()s this

  const int n = static_cast<int>(rd(f));
  std::deque<sensor_msgs::msg::Imu::SharedPtr> imus;
  for (int i = 0; i < n; i++) imus.push_back(mk_imu(f));

  const int np = static_cast<int>(rd(f));
  pcl::PointCloud<PointType> pcl_in;
  pcl_in.resize(np);
  for (int i = 0; i < np; i++) {
    pcl_in.points[i].x = static_cast<float>(rd(f));
    pcl_in.points[i].y = static_cast<float>(rd(f));
    pcl_in.points[i].z = static_cast<float>(rd(f));
    pcl_in.points[i].curvature = static_cast<float>(rd(f));
  }

  ekf.motion_blur(xc, pcl_in, imus);

  emit(xc.t);
  emit_mat(xc.R);
  emit_vec(xc.p);
  emit_vec(xc.v);
  emit_mat(xc.cov);
  for (int i = 0; i < np; i++) {
    emit(pcl_in.points[i].x);
    emit(pcl_in.points[i].y);
    emit(pcl_in.points[i].z);
  }
  return 0;
}

int run_lm(FILE* f) {
  // The FULL windowed-BA LM driver COMPILED FROM THE REFERENCE SOURCE:
  // LI_BA_Optimizer::damping_iter (optimizers.cpp:430-517) — gauge fixing,
  // Nielsen damping, preintegration bias-correction rollback, the 1e-6
  // relative-residual break — over LidarFactor + IMU_PRE edges built from
  // the fixture. Emits the refined window states, the output Hessian, and
  // the Clock-probe count (2 per Hessian eval + 2 per iteration).
  noiseMeas = Eigen::Matrix<double, 6, 6>::Zero();
  noiseWalk = Eigen::Matrix<double, 6, 6>::Zero();
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < 6; j++) noiseMeas(i, j) = rd(f);
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < 6; j++) noiseWalk(i, j) = rd(f);
  imupre_scale_gravity = rd(f);
  imu_coef = rd(f);

  const int W = static_cast<int>(rd(f));
  const int V = static_cast<int>(rd(f));
  std::vector<IMUST> xs(W);
  for (int i = 0; i < W; i++) xs[i] = rd_state(f);

  LidarFactor lf(W);
  for (int a = 0; a < V; a++) {
    double coe = rd(f);
    PointCluster fix = rd_cluster(f);
    std::vector<PointCluster> per(W);
    for (int i = 0; i < W; i++) per[i] = rd_cluster(f);
    Eigen::Vector3d ev = Eigen::Vector3d::Zero();
    Eigen::Matrix3d eV = Eigen::Matrix3d::Identity();
    PointCluster add;
    lf.push_voxel(per, fix, coe, ev, eV, add);
  }

  std::deque<IMU_PRE*> imus;
  for (int e = 0; e < W - 1; e++) {
    Eigen::Vector3d bg = rd3(f), ba = rd3(f);
    auto* pre = new IMU_PRE(bg, ba);
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
    pre->push_imu(buf);
    imus.push_back(pre);
  }

  // seed the cached eig state at the entry poses, as recut/tras_opt does
  // before the pipeline's damping_iter call (octree.cpp:524-541)
  double res0 = 0;
  lf.evaluate_only_residual(xs, 0, V, res0);

  LI_BA_Optimizer opt;
  Eigen::MatrixXd hess;
  g_oracle_clock_calls = 0;
  opt.damping_iter(xs, lf, imus, &hess);

  emit(res0);
  for (int i = 0; i < W; i++) {
    emit_mat(xs[i].R);
    emit_vec(xs[i].p);
    emit_vec(xs[i].v);
    emit_vec(xs[i].bg);
    emit_vec(xs[i].ba);
  }
  for (int e = 0; e < W - 1; e++) {
    emit_vec(imus[e]->dbg);
    emit_vec(imus[e]->dba);
  }
  emit_mat(hess);
  emit(static_cast<double>(g_oracle_clock_calls));
  for (auto* p : imus) delete p;
  return 0;
}

int run_lmg(FILE* f) {
  // LI_BA_OptimizerGravity::damping_iter (optimizers.cpp:746-826) COMPILED
  // FROM THE REFERENCE SOURCE: the motion_init gravity-refining LM with the
  // shared 3-dim gravity column, 6-DoF gauge (cpp:772-775), and
  // give_evaluate_g IMU edges. Same fixture as "lm" plus a leading
  // max_iter. Emits resis[0], refined states incl. g, dbg/dba, resis.back.
  noiseMeas = Eigen::Matrix<double, 6, 6>::Zero();
  noiseWalk = Eigen::Matrix<double, 6, 6>::Zero();
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < 6; j++) noiseMeas(i, j) = rd(f);
  for (int i = 0; i < 6; i++)
    for (int j = 0; j < 6; j++) noiseWalk(i, j) = rd(f);
  imupre_scale_gravity = rd(f);
  imu_coef = rd(f);
  const int max_iter = static_cast<int>(rd(f));

  const int W = static_cast<int>(rd(f));
  const int V = static_cast<int>(rd(f));
  std::vector<IMUST> xs(W);
  for (int i = 0; i < W; i++) xs[i] = rd_state(f);

  LidarFactor lf(W);
  for (int a = 0; a < V; a++) {
    double coe = rd(f);
    PointCluster fix = rd_cluster(f);
    std::vector<PointCluster> per(W);
    for (int i = 0; i < W; i++) per[i] = rd_cluster(f);
    Eigen::Vector3d ev = Eigen::Vector3d::Zero();
    Eigen::Matrix3d eV = Eigen::Matrix3d::Identity();
    PointCluster add;
    lf.push_voxel(per, fix, coe, ev, eV, add);
  }

  std::deque<IMU_PRE*> imus;
  for (int e = 0; e < W - 1; e++) {
    Eigen::Vector3d bg = rd3(f), ba = rd3(f);
    auto* pre = new IMU_PRE(bg, ba);
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
    pre->push_imu(buf);
    imus.push_back(pre);
  }

  double res0 = 0;
  lf.evaluate_only_residual(xs, 0, V, res0);

  LI_BA_OptimizerGravity opt;
  Eigen::MatrixXd hess;
  std::vector<double> resis;
  opt.damping_iter(xs, lf, imus, resis, &hess, max_iter);

  emit(resis.front());
  for (int i = 0; i < W; i++) {
    emit_mat(xs[i].R);
    emit_vec(xs[i].p);
    emit_vec(xs[i].v);
    emit_vec(xs[i].bg);
    emit_vec(xs[i].ba);
    emit_vec(xs[i].g);
  }
  for (int e = 0; e < W - 1; e++) {
    emit_vec(imus[e]->dbg);
    emit_vec(imus[e]->dba);
  }
  emit(resis.back());
  for (auto* p : imus) delete p;
  return 0;
}

int run_iekf(FILE* f) {
  // One VNC-IEKF iteration's solver math (odometry.cpp:100-207) on
  // PRECOMPUTED match results: the per-point point-to-plane accumulation,
  // the VNC normal-consistency block, and the DIM-state gain/solution
  // algebra, using the reference's own IMUST boxminus (types.hpp:77-88)
  // and hat/Exp/Log (math.hpp). Map lookups (octree match/sigma) are
  // fixture inputs, so this isolates exactly the estimation equations.
  IMUST x_prop = rd_state(f);
  IMUST x_curr = rd_state(f);
  Eigen::Matrix<double, DIM, DIM> cov;
  for (int i = 0; i < DIM; i++)
    for (int j = 0; j < DIM; j++) cov(i, j) = rd(f);

  Eigen::Matrix<double, 6, 6> HTH;
  HTH.setZero();
  Eigen::Matrix<double, 6, 1> HTz;
  HTz.setZero();
  Eigen::Matrix3d nnt;
  nnt.setZero();
  int match_num = 0;

  const int n = static_cast<int>(rd(f));
  for (int i = 0; i < n; i++) {
    Eigen::Vector3d pnt = rd3(f);
    int flag = static_cast<int>(rd(f));
    Eigen::Vector3d normal = rd3(f);
    Eigen::Vector3d center = rd3(f);
    double sigma_d = rd(f);
    if (!flag) continue;
    Eigen::Matrix3d phat = hat(pnt);
    Eigen::Vector3d wld = x_curr.R * pnt + x_curr.p;
    double R_inv = 1.0 / (0.0005 + sigma_d);
    double resi = normal.dot(wld - center);
    Eigen::Matrix<double, 6, 1> jac;
    jac.head(3) = phat * x_curr.R.transpose() * normal;
    jac.tail(3) = normal;
    HTH += R_inv * jac * jac.transpose();
    HTz -= R_inv * jac * resi;
    nnt += normal * normal.transpose();
    match_num++;
  }

  const int s = static_cast<int>(rd(f));
  for (int i = 0; i < s; i++) {
    Eigen::Vector3d n_body = rd3(f);
    double quality = rd(f);
    double sigma_n = rd(f);
    int found = static_cast<int>(rd(f));
    Eigen::Vector3d n_map = rd3(f);
    if (!found) continue;
    n_map.normalize();
    Eigen::Vector3d n_scan_world = (x_curr.R * n_body).normalized();
    double dot = std::abs(n_scan_world.dot(n_map));
    if (dot < 0.7) continue;
    Eigen::Matrix3d S = Eigen::Matrix3d::Identity() - n_map * n_map.transpose();
    Eigen::Vector3d r = S * n_scan_world;
    Eigen::Matrix<double, 3, 6> J;
    J.block<3, 3>(0, 0) = -S * x_curr.R * hat(n_body);
    J.block<3, 3>(0, 3).setZero();
    double w = 0.1 * quality / (sigma_n * sigma_n + 0.01);
    if (!std::isfinite(w)) continue;
    HTH += w * J.transpose() * J;
    HTz -= w * J.transpose() * r;
  }

  Eigen::Matrix<double, DIM, DIM> H_T_H;
  H_T_H.setZero();
  H_T_H.block<6, 6>(0, 0) = HTH;
  Eigen::Matrix<double, DIM, DIM> cov_inv = cov.inverse();
  Eigen::Matrix<double, DIM, DIM> K_1 = (H_T_H + cov_inv).inverse();
  Eigen::Matrix<double, DIM, 6> G6 = K_1.block<DIM, 6>(0, 0) * HTH;
  Eigen::Matrix<double, DIM, 1> vec = x_prop - x_curr;
  Eigen::Matrix<double, DIM, 1> solution =
      K_1.block<DIM, 6>(0, 0) * HTz + vec - G6 * vec.block<6, 1>(0, 0);

  IMUST x_next = x_curr;
  x_next += solution;

  Eigen::Matrix<double, DIM, DIM> G;
  G.setZero();
  G.block<DIM, 6>(0, 0) = G6;
  Eigen::Matrix<double, DIM, DIM> cov_post =
      (Eigen::Matrix<double, DIM, DIM>::Identity() - G) * cov;

  emit(static_cast<double>(match_num));
  emit_vec(solution);
  emit_mat(nnt);
  emit_mat(x_next.R);
  emit_vec(x_next.p);
  emit_vec(x_next.v);
  emit_mat(cov_post);
  return 0;
}

// ---------------------------------------------------------------- map
// Drives the UNMODIFIED reference voxel map (octree.cpp + voxel_map.cpp,
// linked by the Makefile) through the runner's per-scan sequence
// (local_mapping.cpp:448-507): cut_voxel -> recut per scan, one margi
// (which refreshes eigens and calls plane_update, octree.cpp:415-450),
// then the odometry-path match() (voxel_map.cpp:287-312) for each query.
// Cross-checked against vina_slam_tpu.mapping.voxel_map by
// tests/test_reference_oracle.py.
//
// Fixture: voxel_size max_layer min_eigen_value max_points min_ba_point
//          min_point[4]  plane_eigen_value_thre[4] (POST-inversion values)
//          wdsize win_count mgsize do_margi
//          win_count x { R(9 row-major) p(3) }
//          win_count x { Nk  Nk x { pnt(3) var(9) } }   (body frame)
//          M  M x { wld(3) var_wld(9) }
// Output per query: flag sigma_d center(3) normal(3) radius eig(3) N
//                   plane_var(36)   [zeros when flag=0]
int run_map(FILE* f) {
  voxel_size = rd(f);
  max_layer = static_cast<int>(rd(f));
  min_eigen_value = rd(f);
  max_points = static_cast<int>(rd(f));
  min_ba_point = static_cast<int>(rd(f));
  for (int i = 0; i < 4; i++) min_point[i] = rd(f);
  plane_eigen_value_thre.resize(4);
  for (int i = 0; i < 4; i++) plane_eigen_value_thre[i] = rd(f);
  int wdsize = static_cast<int>(rd(f));
  int win_count = static_cast<int>(rd(f));
  int mgsize = static_cast<int>(rd(f));
  int do_margi = static_cast<int>(rd(f));

  mp.resize(wdsize);
  for (int i = 0; i < wdsize; i++) mp[i] = i;  // node.cpp:430-434

  std::vector<IMUST> x_buf(wdsize);
  for (int i = 0; i < win_count; i++) {
    x_buf[i].R = rd33(f);
    x_buf[i].p = rd3(f);
  }

  std::unordered_map<VOXEL_LOC, OctoTree*> feat_map, feat_tem_map;
  std::vector<SlideWindow*> sws;
  for (int i = 0; i < win_count; i++) {
    int n = static_cast<int>(rd(f));
    PVecPtr pvec = std::make_shared<PVec>();
    PLV(3) pwld;
    for (int k = 0; k < n; k++) {
      pointVar pv;
      pv.pnt = rd3(f);
      pv.var = rd33(f);
      pvec->push_back(pv);
      pwld.push_back(x_buf[i].R * pv.pnt + x_buf[i].p);
    }
    cut_voxel(feat_map, pvec, i, feat_tem_map, wdsize, pwld, sws);
    // multi_recut analog (local_mapping.cpp:86-143): recut every voxel
    // touched since the last margi, at the grown window count
    for (auto& kv : feat_tem_map) kv.second->recut(i + 1, x_buf, sws);
  }
  if (do_margi) {
    LidarFactor voxhess(wdsize);
    for (auto& kv : feat_tem_map)
      kv.second->margi(win_count, mgsize, x_buf, voxhess);
  }
  emit(static_cast<double>(feat_map.size()));

  int m = static_cast<int>(rd(f));
  for (int q = 0; q < m; q++) {
    Eigen::Vector3d wld = rd3(f);
    Eigen::Matrix3d var_wld = rd33(f);
    Plane* pla = nullptr;
    double sigma_d = 0;
    OctoTree* oc = nullptr;
    int flag = match(feat_map, wld, pla, var_wld, sigma_d, oc);
    emit(static_cast<double>(flag));
    if (flag && pla != nullptr && oc != nullptr) {
      emit(sigma_d);
      emit_vec(pla->center);
      emit_vec(pla->normal);
      emit(static_cast<double>(pla->radius));
      emit_vec(oc->eig_value);
      emit(static_cast<double>(oc->pcr_add.N));
      emit_mat(pla->plane_var);
    } else {
      for (int z = 0; z < 48; z++) emit(0.0);
    }
  }
  return 0;
}

// ----------------------------------------------------------- scanplane
// VNC scan-voxel plane extraction: generate_voxel (voxel_map.cpp:169-200,
// x_curr = identity so both sides see the same frame) + the reference
// OctoTree::fitScanPlane recursion (octree.cpp:628-684), then the
// collectScanPlanes quality gates transliterated from odometry.cpp:22-60.
// Fixture: voxel_size max_layer min_eigen_value thre[4]  N  N x pnt(3)
// Output: n_planes, then per plane center(3) normal(3) quality sigma_n.
void collect_scan_planes_ref(OctoTree* node, std::vector<double>& out) {
  if (node == nullptr) return;
  if (node->octo_state == 0) {
    if (node->plane.is_plane && node->eig_value[1] > 1e-12 &&
        node->eig_value[0] / node->eig_value[1] <= 0.12) {
      double lsum = node->eig_value[0] + node->eig_value[1] +
                    node->eig_value[2] + 1e-10;
      double quality = 1.0 - node->eig_value[0] / lsum;
      if (quality > 0.5) {
        Eigen::Vector3d n = node->plane.normal;
        double nn = n.norm();
        if (nn >= 1e-12) {
          n /= nn;
          for (int k = 0; k < 3; k++) out.push_back(node->plane.center[k]);
          for (int k = 0; k < 3; k++) out.push_back(n[k]);
          out.push_back(quality);
          out.push_back(std::sqrt(std::max(0.0, node->eig_value[0] / lsum)));
        }
      }
    }
  } else {
    for (int i = 0; i < 8; i++) collect_scan_planes_ref(node->leaves[i], out);
  }
}

int run_scanplane(FILE* f) {
  voxel_size = rd(f);
  max_layer = static_cast<int>(rd(f));
  min_eigen_value = rd(f);
  plane_eigen_value_thre.resize(4);
  for (int i = 0; i < 4; i++) plane_eigen_value_thre[i] = rd(f);
  int n = static_cast<int>(rd(f));
  PVec pvec(n);
  for (int k = 0; k < n; k++) {
    pvec[k].pnt = rd3(f);
    pvec[k].var.setZero();
  }
  IMUST ident;
  std::unordered_map<VOXEL_LOC, OctoTree*> feat_map;
  generate_voxel(feat_map, ident, pvec, voxel_size);
  std::vector<double> out;
  for (auto& kv : feat_map) {
    kv.second->fitScanPlane(Eigen::Vector3d::Zero());
    collect_scan_planes_ref(kv.second, out);
  }
  emit(static_cast<double>(out.size() / 8));
  for (double x : out) emit(x);
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
  if (!strcmp(argv[1], "iekf")) return run_iekf(f);
  if (!strcmp(argv[1], "ekf")) return run_ekf(f);
  if (!strcmp(argv[1], "lm")) return run_lm(f);
  if (!strcmp(argv[1], "lmg")) return run_lmg(f);
  if (!strcmp(argv[1], "map")) return run_map(f);
  if (!strcmp(argv[1], "scanplane")) return run_scanplane(f);
  fprintf(stderr, "oracle: unknown mode %s\n", argv[1]);
  return 2;
}
