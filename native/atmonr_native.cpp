// AtmoNR-TPU native runtime: multithreaded host-side geospatial kernels.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the host
// runtime work the reference delegates to native code paths (device-resident
// torch tensor math for geolocation, datasets/harp2.py + geospatial/wgs_84.py):
// dataset construction must convert millions of satellite pixels into rays
// with an iterative WGS-84 origin solve (reference wgs_84.py:223-290), which
// is embarrassingly parallel and memory-bound — a natural OpenMP kernel.
//
// Exposed via a C ABI for ctypes (no pybind11 dependency):
//   atmonr_build_rays    — per-pixel ray construction (origins, dirs, lens)
//   atmonr_h2c / atmonr_c2h — bulk WGS-84 horizontal<->Cartesian conversion
//
// Build: make -C native    (produces libatmonr_native.so)

#include <cmath>
#include <cstdint>
#include <limits>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr double kA = 6378137.0;           // WGS-84 semimajor axis
constexpr double kB = 6356752.314245;      // WGS-84 semiminor axis
constexpr double kE = (kA * kA - kB * kB) / (kA * kA);   // e^2
constexpr double kE2 = (kA * kA - kB * kB) / (kB * kB);  // e'^2
constexpr double kPi = 3.14159265358979323846;
constexpr double kDeg = kPi / 180.0;

inline void horizontal_to_cartesian(double lat, double lon, double alt,
                                    double* x, double* y, double* z) {
  lat *= kDeg;
  lon *= kDeg;
  const double sin_lat = std::sin(lat);
  const double n = kA / std::sqrt(1.0 - kE * sin_lat * sin_lat);
  const double cos_lat = std::cos(lat);
  *x = (n + alt) * cos_lat * std::cos(lon);
  *y = (n + alt) * cos_lat * std::sin(lon);
  *z = (n * (1.0 - kE) + alt) * sin_lat;
}

// Bowring (1976) first-order approximation, matching geo/wgs84.py.
inline void cartesian_to_horizontal(double x, double y, double z, double* lat,
                                    double* lon, double* alt) {
  const double lon_r = std::atan2(y, x);
  const double d = std::sqrt(x * x + y * y);
  const double u = std::atan2(z / d, kA / kB);
  const double su = std::sin(u), cu = std::cos(u);
  const double lat_r =
      std::atan2(z + kE2 * kB * su * su * su, d - kE * kA * cu * cu * cu);
  const double sl = std::sin(lat_r);
  const double n = kA / std::sqrt(1.0 - kE * sl * sl);
  *alt = x / (std::cos(lat_r) * std::cos(lon_r)) - n;
  *lat = lat_r / kDeg;
  *lon = lon_r / kDeg;
}

// R(theta, phi) applied to +z, with the sign flip convention of
// geo/wgs84.py horizontal_coords_to_rot_mtx (third column of the matrix).
inline void dirvec(double theta, double phi, double* dx, double* dy,
                   double* dz) {
  const double t = -theta * kDeg, p = -phi * kDeg;
  const double st = std::sin(t), ct = std::cos(t);
  const double sp = std::sin(p), cp = std::cos(p);
  *dx = sp * st;
  *dy = -cp * st;
  *dz = ct;
}

// Rotate a +z=up-frame direction into the WGS-84 Cartesian frame
// (geo/wgs84.py compose_dirs_and_surface_normals, incl. the 180-degree
// z-rotation between the WGS frame and the scene frame).
inline void compose_dir(double dx, double dy, double dz, double lat,
                        double lon, double* ox, double* oy, double* oz) {
  const double t = -(90.0 - lat) * kDeg, p = -(90.0 - lon) * kDeg;
  const double st = std::sin(t), ct = std::cos(t);
  const double sp = std::sin(p), cp = std::cos(p);
  // z-flip: (x, y, z) -> (-x, -y, z)
  const double vx = -dx, vy = -dy, vz = dz;
  *ox = cp * vx + (-sp * ct) * vy + (sp * st) * vz;
  *oy = sp * vx + (cp * ct) * vy + (-cp * st) * vz;
  *oz = st * vy + ct * vz;
}

}  // namespace

extern "C" {

// Per-pixel ray construction. Inputs are float32 arrays of length n (NaNs
// propagate to NaN outputs, filtered later like the reference's
// filter_rays). Outputs: origins (n,3), dirs (n,3), lens (n) float32.
void atmonr_build_rays(const float* lat, const float* lon, const float* alt,
                       const float* thetav, const float* phiv, int64_t n,
                       double ray_origin_height, double tol, int max_iters,
                       float* origins, float* dirs, float* lens) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    double x, y, z;
    horizontal_to_cartesian(lat[i], lon[i], alt[i], &x, &y, &z);
    // match the f32 quantization of the surface point (wgs_84.py:257)
    x = static_cast<double>(static_cast<float>(x));
    y = static_cast<double>(static_cast<float>(y));
    z = static_cast<double>(static_cast<float>(z));

    double dx, dy, dz;
    dirvec(thetav[i], phiv[i], &dx, &dy, &dz);
    double cx, cy, cz;
    compose_dir(dx, dy, dz, lat[i], lon[i], &cx, &cy, &cz);
    // flip: top of atmosphere is the origin
    cx = -cx;
    cy = -cy;
    cz = -cz;

    // fixed-point iteration on the ray length so the origin sits at
    // ray_origin_height above the ellipsoid
    double len =
        (ray_origin_height - static_cast<double>(alt[i])) /
        std::cos(static_cast<double>(thetav[i]) * kDeg);
    double la, lo, alt_check;
    for (int it = 0; it <= max_iters; ++it) {
      const double px = x - len * cx, py = y - len * cy, pz = z - len * cz;
      cartesian_to_horizontal(px, py, pz, &la, &lo, &alt_check);
      if (std::fabs(ray_origin_height - alt_check) <= tol) break;
      len *= ray_origin_height / alt_check;
    }
    len = static_cast<double>(static_cast<float>(len));
    origins[3 * i + 0] = static_cast<float>(x - cx * len);
    origins[3 * i + 1] = static_cast<float>(y - cy * len);
    origins[3 * i + 2] = static_cast<float>(z - cz * len);
    dirs[3 * i + 0] = static_cast<float>(cx);
    dirs[3 * i + 1] = static_cast<float>(cy);
    dirs[3 * i + 2] = static_cast<float>(cz);
    lens[i] = static_cast<float>(len);
  }
}

void atmonr_h2c(const double* lat, const double* lon, const double* alt,
                int64_t n, double* x, double* y, double* z) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    horizontal_to_cartesian(lat[i], lon[i], alt[i], &x[i], &y[i], &z[i]);
  }
}

void atmonr_c2h(const double* x, const double* y, const double* z, int64_t n,
                double* lat, double* lon, double* alt) {
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    cartesian_to_horizontal(x[i], y[i], z[i], &lat[i], &lon[i], &alt[i]);
  }
}

// Batched Amanatides-Woo voxel traversal (Amanatides & Woo 1987), matching
// extract/voxel_traversal.py step-for-step (start voxel emitted first; an
// axis freezes once it reaches its destination coordinate; a ray finishes
// when every axis has arrived or any axis overshot). Rays are independent —
// one OpenMP task each. Two-pass protocol: call with out_vox = NULL to get
// per-ray counts only (offsets ignored), then with offsets = exclusive
// prefix sum of the counts to write the compact voxel list.
void atmonr_voxel_traversal(const double* u, const double* end, int64_t n,
                            const int64_t* offsets, int32_t* out_vox,
                            int32_t* out_counts) {
  const double kInf = std::numeric_limits<double>::infinity();
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n; ++i) {
    const double* ui = u + 3 * i;
    const double* ei = end + 3 * i;
    int32_t vox[3], vend[3], sgn[3];
    double tmax[3], tdelta[3];
    double d2 = 0.0;
    for (int d = 0; d < 3; ++d) {
      const double dd = ei[d] - ui[d];
      d2 += dd * dd;
    }
    const double dist = std::sqrt(d2);
    for (int d = 0; d < 3; ++d) {
      vox[d] = static_cast<int32_t>(std::floor(ui[d]));
      vend[d] = static_cast<int32_t>(std::floor(ei[d]));
      const double v = dist > 0.0 ? (ei[d] - ui[d]) / dist : 0.0;
      sgn[d] = (v > 0.0) - (v < 0.0);
      if (sgn[d] == 0 || vox[d] == vend[d]) {
        tmax[d] = kInf;
        tdelta[d] = kInf;
      } else {
        const double svu = sgn[d] * ui[d];
        tmax[d] = std::fabs((std::ceil(svu) - svu) / v);
        tdelta[d] = std::fabs(1.0 / v);
      }
    }
    int32_t* out = out_vox ? out_vox + 3 * offsets[i] : nullptr;
    int64_t count = 0;
    if (out) {
      out[0] = vox[0];
      out[1] = vox[1];
      out[2] = vox[2];
    }
    ++count;
    bool all_arrived = true, overshot = false;
    for (int d = 0; d < 3; ++d) {
      const int64_t diff =
          static_cast<int64_t>(vox[d] - vend[d]) * sgn[d];
      all_arrived &= diff == 0;
      overshot |= diff > 0;
    }
    bool done = all_arrived || overshot;
    while (!done) {
      int axis = 0;
      if (tmax[1] < tmax[axis]) axis = 1;
      if (tmax[2] < tmax[axis]) axis = 2;
      tmax[axis] += tdelta[axis];
      vox[axis] += sgn[axis];
      if (out) {
        out[3 * count + 0] = vox[0];
        out[3 * count + 1] = vox[1];
        out[3 * count + 2] = vox[2];
      }
      ++count;
      bool all_nonneg = true;
      overshot = false;
      for (int d = 0; d < 3; ++d) {
        const int64_t diff =
            static_cast<int64_t>(vox[d] - vend[d]) * sgn[d];
        if (diff >= 0) tmax[d] = kInf;  // axis arrived: freeze it
        all_nonneg &= diff >= 0;
        overshot |= diff > 0;
      }
      done = all_nonneg || overshot;
    }
    out_counts[i] = static_cast<int32_t>(count);
  }
}

int atmonr_num_threads() {
#ifdef _OPENMP
  return omp_get_max_threads();
#else
  return 1;
#endif
}

}  // extern "C"
