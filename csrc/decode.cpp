// Native sensor decode runtime (host side).
//
// Re-implements the semantics of the reference's LidarPointCloudDecoder
// (src/sensor/lidar_pointcloud_decoder.cpp) as a C-ABI shared library used
// via ctypes: per-vendor point-record decode with the point_filter_num
// stride and blind-radius cull, the Velodyne azimuth-unwrap timestamp
// reconstruction (exact bias/cool-down algorithm, decoder cpp:103-141),
// the scan post-processing (sort by per-point time, trim > 0.11 s,
// lidar_decoder.cpp:7-43), and a raw PointCloud2-layout parser so bag blobs
// decode without per-field Python copies.
//
// Build: make -C csrc   (produces libvina_host.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- helpers

static inline bool keep_stride_blind(int64_t i, float r2, int filter_num,
                                     float blind_sq) {
  if (filter_num < 1) filter_num = 1;
  return (i % filter_num) == 0 && r2 > blind_sq;
}

// ------------------------------------------------------------------ livox

// offset_time in ns -> rel seconds (decoder cpp:56-75)
int64_t vs_decode_livox(int64_t n, const float* x, const float* y,
                        const float* z, const float* refl,
                        const double* offset_ns, int filter_num,
                        float blind_sq, float* out_xyz, float* out_int,
                        float* out_t) {
  int64_t m = 0;
  for (int64_t i = 0; i < n; i++) {
    float r2 = x[i] * x[i] + y[i] * y[i] + z[i] * z[i];
    if (!keep_stride_blind(i, r2, filter_num, blind_sq)) continue;
    out_xyz[3 * m] = x[i];
    out_xyz[3 * m + 1] = y[i];
    out_xyz[3 * m + 2] = z[i];
    out_int[m] = refl ? refl[i] : 0.f;
    out_t[m] = static_cast<float>(offset_ns[i] * 1e-9);
    m++;
  }
  return m;
}

// --------------------------------------------------------------- velodyne

// Exact azimuth-unwrap reconstruction with the reference's bias/cool-down
// state machine (decoder cpp:103-141). Used when per-point times are absent
// or insane; omega_l in deg/s.
int64_t vs_decode_velodyne(int64_t n, const float* x, const float* y,
                           const float* z, const float* inten,
                           const float* time, int filter_num, float blind_sq,
                           double omega_l, float* out_xyz, float* out_int,
                           float* out_t) {
  int64_t m = 0;
  if (n == 0) return 0;
  if (time && time[n - 1] > 0.01f && time[n - 1] < 0.12f) {
    for (int64_t i = 0; i < n; i++) {
      float r2 = x[i] * x[i] + y[i] * y[i] + z[i] * z[i];
      if (!keep_stride_blind(i, r2, filter_num, blind_sq)) continue;
      out_xyz[3 * m] = x[i];
      out_xyz[3 * m + 1] = y[i];
      out_xyz[3 * m + 2] = z[i];
      out_int[m] = inten ? inten[i] : 0.f;
      out_t[m] = time[i];
      m++;
    }
    return m;
  }

  bool first = true;
  double yaw0 = 0, yaw_last = 0, bias = 0;
  int cool = 0;
  for (int64_t i = 0; i < n; i++) {
    if (std::fabs(x[i]) < 0.1f) continue;
    double yaw = std::atan2((double)y[i], (double)x[i]) * 57.2957795 - bias;
    if (first) {
      yaw0 = yaw_last = yaw;
      first = false;
    }
    float r2 = x[i] * x[i] + y[i] * y[i] + z[i] * z[i];
    if (r2 < blind_sq) continue;
    if ((yaw - yaw_last) > 180.0 && cool-- <= 0) {
      bias += 360.0;
      yaw -= 360.0;
      cool = 1000;
    }
    if (std::fabs(yaw - yaw_last) > 180.0) yaw += 360.0;
    double rel = (yaw0 - yaw) / omega_l;
    yaw_last = yaw;
    if (rel >= 0 && rel < 0.1 && (i % (filter_num < 1 ? 1 : filter_num)) == 0) {
      out_xyz[3 * m] = x[i];
      out_xyz[3 * m + 1] = y[i];
      out_xyz[3 * m + 2] = z[i];
      out_int[m] = inten ? inten[i] : 0.f;
      out_t[m] = static_cast<float>(rel);
      m++;
    }
  }
  return m;
}

// ----------------------------------------------------- ouster/hesai/rslidar

// generic absolute/relative per-point timestamp decode:
//   mode 0: t_rel = ts[i] * scale                  (ouster: ns -> s)
//   mode 1: t_rel = ts[i] - ts[0]                  (hesai rebase)
//   mode 2: t_rel = ts[i] - base                   (robosense header rebase)
// blind_dims: 3 -> r^2 = x^2+y^2+z^2, 2 -> x^2+y^2 (robosense, cpp:217)
int64_t vs_decode_stamped(int64_t n, const float* x, const float* y,
                          const float* z, const float* inten,
                          const double* ts, int mode, double scale,
                          double base, int blind_dims, int filter_num,
                          float blind_sq, float* out_xyz, float* out_int,
                          float* out_t) {
  int64_t m = 0;
  double t0 = (mode == 1 && n > 0) ? ts[0] : base;
  for (int64_t i = 0; i < n; i++) {
    if (!std::isfinite(x[i]) || !std::isfinite(y[i]) || !std::isfinite(z[i]))
      continue;
    float r2 = x[i] * x[i] + y[i] * y[i];
    if (blind_dims == 3) r2 += z[i] * z[i];
    if (!keep_stride_blind(i, r2, filter_num, blind_sq)) continue;
    double rel;
    if (mode == 0)
      rel = ts[i] * scale;
    else
      rel = ts[i] - t0;
    out_xyz[3 * m] = x[i];
    out_xyz[3 * m + 1] = y[i];
    out_xyz[3 * m + 2] = z[i];
    out_int[m] = inten ? inten[i] : 0.f;
    out_t[m] = static_cast<float>(rel);
    m++;
  }
  return m;
}

// ------------------------------------------------------------ postprocess

// pcl_handler steps (lidar_decoder.cpp:7-43): stable sort by rel time,
// drop rel > 0.11 s. In-place over parallel arrays; returns new count.
int64_t vs_postprocess(int64_t n, float* xyz, float* inten, float* t) {
  std::vector<int64_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0);
  std::stable_sort(idx.begin(), idx.end(),
                   [&](int64_t a, int64_t b) { return t[a] < t[b]; });
  std::vector<float> xyz2(3 * n), in2(n), t2(n);
  int64_t m = 0;
  for (int64_t k = 0; k < n; k++) {
    int64_t i = idx[k];
    if (t[i] > 0.11f) break;  // sorted: everything later is dropped too
    xyz2[3 * m] = xyz[3 * i];
    xyz2[3 * m + 1] = xyz[3 * i + 1];
    xyz2[3 * m + 2] = xyz[3 * i + 2];
    in2[m] = inten[i];
    t2[m] = t[i];
    m++;
  }
  std::memcpy(xyz, xyz2.data(), sizeof(float) * 3 * m);
  std::memcpy(inten, in2.data(), sizeof(float) * m);
  std::memcpy(t, t2.data(), sizeof(float) * m);
  return m;
}

// ------------------------------------------------- Livox CustomMsg (CDR)

// One-pass livox_ros_driver2/msg/CustomMsg decode from the raw CDR message
// body (INCLUDING the 4-byte representation header): header parse + point
// extraction + point_filter_num stride + blind cull + ns->s time scale in a
// single sweep (fuses rosbag.parse_livox_custom + decoders.decode_livox).
// Returns kept count (or -1 on malformed input); writes the header stamp
// to *stamp_out. Caller sizes outputs to (len / 20) points.
int64_t vs_decode_livox_cdr(const uint8_t* msg, int64_t len, int filter_num,
                            float blind_sq, float* out_xyz, float* out_int,
                            float* out_t, double* stamp_out) {
  if (len < 4) return -1;
  const uint8_t* buf = msg + 4;  // skip CDR representation header
  int64_t blen = len - 4;
  int64_t pos = 0;
  auto align = [&](int64_t n) { int64_t r = pos % n; if (r) pos += n - r; };
  auto rd_u32 = [&]() { align(4); uint32_t v; std::memcpy(&v, buf + pos, 4); pos += 4; return v; };
  auto rd_i32 = [&]() { align(4); int32_t v; std::memcpy(&v, buf + pos, 4); pos += 4; return v; };

  if (blen < 16) return -1;
  int32_t sec = rd_i32();
  uint32_t nsec = rd_u32();
  *stamp_out = (double)sec + 1e-9 * (double)nsec;
  uint32_t slen = rd_u32();           // frame_id string
  pos += slen;
  align(8); pos += 8;                 // timebase u64
  if (pos + 16 > blen) return -1;
  uint32_t point_num = rd_u32();
  pos += 1 + 3;                       // lidar_id + rsvd[3]
  uint32_t n = rd_u32();
  if (point_num && point_num < n) n = point_num;
  align(4);
  if (filter_num < 1) filter_num = 1;

  int64_t m = 0;
  for (uint32_t i = 0; i < n; i++) {
    int64_t p = pos + (int64_t)i * 20;
    if (p + 17 > blen) break;         // final record may omit its pad byte
    float x, y, z;
    uint32_t off;
    std::memcpy(&off, buf + p, 4);
    std::memcpy(&x, buf + p + 4, 4);
    std::memcpy(&y, buf + p + 8, 4);
    std::memcpy(&z, buf + p + 12, 4);
    float r2 = x * x + y * y + z * z;
    if (!keep_stride_blind(i, r2, filter_num, blind_sq)) continue;
    out_xyz[3 * m] = x;
    out_xyz[3 * m + 1] = y;
    out_xyz[3 * m + 2] = z;
    out_int[m] = (float)buf[p + 16];
    out_t[m] = (float)(off * 1e-9);
    m++;
  }
  return m;
}

// ---------------------------------------------------- PointCloud2 parsing

// Extract float32/float64/uint32 fields from a packed point blob
// (sensor_msgs/PointCloud2 layout: n records of point_step bytes).
// dtype: 0=f32, 1=f64, 2=u32, 3=u16, 4=u8. Output always f64.
void vs_pc2_extract(const uint8_t* data, int64_t n, int64_t point_step,
                    int64_t offset, int dtype, double* out) {
  for (int64_t i = 0; i < n; i++) {
    const uint8_t* p = data + i * point_step + offset;
    switch (dtype) {
      case 0: {
        float v;
        std::memcpy(&v, p, 4);
        out[i] = v;
        break;
      }
      case 1: {
        double v;
        std::memcpy(&v, p, 8);
        out[i] = v;
        break;
      }
      case 2: {
        uint32_t v;
        std::memcpy(&v, p, 4);
        out[i] = v;
        break;
      }
      case 3: {
        uint16_t v;
        std::memcpy(&v, p, 2);
        out[i] = v;
        break;
      }
      case 4:
        out[i] = p[0];
        break;
    }
  }
}

}  // extern "C"
