// miseg_native — C++ host-side hot ops for the data/eval pipeline.
//
// The reference inherits its CPU preprocessing speed from MONAI/scipy's C
// internals (SURVEY §2.9); this library is the first-party equivalent for
// the two host-side hot paths of the TPU build:
//   * affine volume resampling (Spacingd forward/inverse, trilinear and
//     nearest) — OpenMP-parallel over output voxels; scipy's
//     ndimage.affine_transform is single-threaded per call;
//   * exact 3D Euclidean distance transform (Felzenszwalb–Huttenlocher,
//     per-axis lower-envelope parabolas) — the SurfaceDistanceMetric core.
//
// Exposed as a C ABI consumed via ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -fopenmp -shared -fPIC)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

extern "C" {

// Affine resample: out[z,y,x] = in(M @ (z,y,x) + off), order 0 or 1.
// in: float32 [d0, d1, d2]; matrix: row-major 3x3; offset: 3.
// Matches scipy.ndimage.affine_transform semantics (constant cval=0).
void resample_affine_f32(const float* in, const int64_t* in_shape,
                         const double* matrix, const double* offset,
                         float* out, const int64_t* out_shape, int order) {
  const int64_t D0 = in_shape[0], D1 = in_shape[1], D2 = in_shape[2];
  const int64_t O0 = out_shape[0], O1 = out_shape[1], O2 = out_shape[2];
  const double m00 = matrix[0], m01 = matrix[1], m02 = matrix[2];
  const double m10 = matrix[3], m11 = matrix[4], m12 = matrix[5];
  const double m20 = matrix[6], m21 = matrix[7], m22 = matrix[8];
  const double f0 = offset[0], f1 = offset[1], f2 = offset[2];

#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t i = 0; i < O0; ++i) {
    for (int64_t j = 0; j < O1; ++j) {
      const double base0 = m00 * i + m01 * j + f0;
      const double base1 = m10 * i + m11 * j + f1;
      const double base2 = m20 * i + m21 * j + f2;
      float* row = out + (i * O1 + j) * O2;
      for (int64_t k = 0; k < O2; ++k) {
        const double s0 = base0 + m02 * k;
        const double s1 = base1 + m12 * k;
        const double s2 = base2 + m22 * k;
        if (order == 0) {
          const int64_t r0 = (int64_t)std::llround(s0);
          const int64_t r1 = (int64_t)std::llround(s1);
          const int64_t r2 = (int64_t)std::llround(s2);
          row[k] = (r0 >= 0 && r0 < D0 && r1 >= 0 && r1 < D1 && r2 >= 0 &&
                    r2 < D2)
                       ? in[(r0 * D1 + r1) * D2 + r2]
                       : 0.0f;
        } else {
          // scipy 'constant' mode: any coordinate outside [0, D-1] → cval
          if (s0 < 0.0 || s0 > D0 - 1 || s1 < 0.0 || s1 > D1 - 1 ||
              s2 < 0.0 || s2 > D2 - 1) {
            row[k] = 0.0f;
            continue;
          }
          const double fl0 = std::floor(s0), fl1 = std::floor(s1),
                       fl2 = std::floor(s2);
          const int64_t a0 = (int64_t)fl0, a1 = (int64_t)fl1,
                        a2 = (int64_t)fl2;
          const double t0 = s0 - fl0, t1 = s1 - fl1, t2 = s2 - fl2;
          double acc = 0.0;
          for (int dz = 0; dz < 2; ++dz) {
            const int64_t z = a0 + dz;
            if (z < 0 || z >= D0) continue;
            const double wz = dz ? t0 : 1.0 - t0;
            for (int dy = 0; dy < 2; ++dy) {
              const int64_t y = a1 + dy;
              if (y < 0 || y >= D1) continue;
              const double wy = dy ? t1 : 1.0 - t1;
              const double wzy = wz * wy;
              const float* p = in + (z * D1 + y) * D2;
              for (int dx = 0; dx < 2; ++dx) {
                const int64_t x = a2 + dx;
                if (x < 0 || x >= D2) continue;
                acc += wzy * (dx ? t2 : 1.0 - t2) * p[x];
              }
            }
          }
          row[k] = (float)acc;
        }
      }
    }
  }
}

// 1-D squared-distance lower envelope (Felzenszwalb & Huttenlocher 2012).
static void edt_1d(const double* f, double* d, int n, int* v, double* z) {
  int k = 0;
  v[0] = 0;
  z[0] = -std::numeric_limits<double>::infinity();
  z[1] = std::numeric_limits<double>::infinity();
  for (int q = 1; q < n; ++q) {
    double s;
    while (true) {
      s = ((f[q] + (double)q * q) - (f[v[k]] + (double)v[k] * v[k])) /
          (2.0 * q - 2.0 * v[k]);
      if (s <= z[k]) {
        --k;
      } else {
        break;
      }
    }
    ++k;
    v[k] = q;
    z[k] = s;
    z[k + 1] = std::numeric_limits<double>::infinity();
  }
  k = 0;
  for (int q = 0; q < n; ++q) {
    while (z[k + 1] < q) ++k;
    const double dq = q - v[k];
    d[q] = dq * dq + f[v[k]];
  }
}

// Exact 3D EDT: dist[v] = euclidean distance from v to the nearest nonzero
// of `mask` (so callers pass the COMPLEMENT of the target set as zeros).
// mask: uint8 [d0,d1,d2]; out: float32 distances.
void edt3d_f32(const uint8_t* mask, const int64_t* shape, float* out) {
  const int64_t D0 = shape[0], D1 = shape[1], D2 = shape[2];
  const double INF = 1e30;
  std::vector<double> g((size_t)(D0 * D1 * D2));

  // pass 1 along axis 2
#pragma omp parallel
  {
    std::vector<double> f(std::max({D0, D1, D2}));
    std::vector<double> d(std::max({D0, D1, D2}));
    std::vector<int> v(std::max({D0, D1, D2}));
    std::vector<double> z(std::max({D0, D1, D2}) + 1);

#pragma omp for collapse(2) schedule(static)
    for (int64_t i = 0; i < D0; ++i)
      for (int64_t j = 0; j < D1; ++j) {
        const uint8_t* m = mask + (i * D1 + j) * D2;
        double* gp = g.data() + (i * D1 + j) * D2;
        for (int64_t k = 0; k < D2; ++k) f[k] = m[k] ? 0.0 : INF;
        edt_1d(f.data(), gp, (int)D2, v.data(), z.data());
      }

    // pass 2 along axis 1
#pragma omp for collapse(2) schedule(static)
    for (int64_t i = 0; i < D0; ++i)
      for (int64_t k = 0; k < D2; ++k) {
        for (int64_t j = 0; j < D1; ++j) f[j] = g[(i * D1 + j) * D2 + k];
        edt_1d(f.data(), d.data(), (int)D1, v.data(), z.data());
        for (int64_t j = 0; j < D1; ++j) g[(i * D1 + j) * D2 + k] = d[j];
      }

    // pass 3 along axis 0
#pragma omp for collapse(2) schedule(static)
    for (int64_t j = 0; j < D1; ++j)
      for (int64_t k = 0; k < D2; ++k) {
        for (int64_t i = 0; i < D0; ++i) f[i] = g[(i * D1 + j) * D2 + k];
        edt_1d(f.data(), d.data(), (int)D0, v.data(), z.data());
        for (int64_t i = 0; i < D0; ++i)
          out[(i * D1 + j) * D2 + k] = (float)std::sqrt(d[i]);
      }
  }
}

// Binary erosion (6-connectivity is NOT what scipy uses by default; scipy
// binary_erosion uses the full 3x3x3 cross (connectivity 1) structuring
// element => 6-neighbourhood + center).  border_value=1 semantics.
void binary_erosion_f32(const uint8_t* mask, const int64_t* shape,
                        uint8_t* out) {
  const int64_t D0 = shape[0], D1 = shape[1], D2 = shape[2];
#pragma omp parallel for collapse(2) schedule(static)
  for (int64_t i = 0; i < D0; ++i)
    for (int64_t j = 0; j < D1; ++j)
      for (int64_t k = 0; k < D2; ++k) {
        const int64_t idx = (i * D1 + j) * D2 + k;
        if (!mask[idx]) {
          out[idx] = 0;
          continue;
        }
        uint8_t keep = 1;
        if (i > 0 && !mask[idx - D1 * D2]) keep = 0;
        if (keep && i + 1 < D0 && !mask[idx + D1 * D2]) keep = 0;
        if (keep && j > 0 && !mask[idx - D2]) keep = 0;
        if (keep && j + 1 < D1 && !mask[idx + D2]) keep = 0;
        if (keep && k > 0 && !mask[idx - 1]) keep = 0;
        if (keep && k + 1 < D2 && !mask[idx + 1]) keep = 0;
        out[idx] = keep;
      }
}

int miseg_native_version() { return 1; }

}  // extern "C"
