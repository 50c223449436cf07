// Baseline anchor: optimized native single-thread cell-list MD step cost.
//
// Measures ms per (cell-list build + LJ force/energy sweep) call at the
// headline bench config (N=65536, rho=0.8, rc=2.5, unshifted LJ) — exactly
// the per-step work the reference pays in CellListMap.map_pairwise!
// (/root/reference/src/simulation.jl:100-104: system update + sweep EVERY
// step, no skin machinery). This pins bench.py's baseline denominator with
// a real measurement instead of only a paper interpolation: the reference
// on a multithreaded node = (this single-thread cost) / thread-scaling,
// with CellListMap's published near-linear scaling on 8-16 threads.
//
// Build: g++ -O3 -march=native -o cellbench cellbench.cc
// Run:   ./cellbench [n] [rho] [rc] [n_calls]

#include <chrono>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <random>
#include <vector>

int main(int argc, char** argv) {
  const int n = argc > 1 ? atoi(argv[1]) : 65536;
  const double rho = argc > 2 ? atof(argv[2]) : 0.8;
  const double rc = argc > 3 ? atof(argv[3]) : 2.5;
  const int n_calls = argc > 4 ? atoi(argv[4]) : 20;
  const double L = cbrt(n / rho);
  const double rc2 = rc * rc;
  const int m = std::max(3, (int)(L / rc));  // cells per axis (size >= rc)
  const double inv_cell = m / L;
  const int n_cells = m * m * m;

  std::mt19937 rng(12345);
  std::uniform_real_distribution<double> uni(0.0, L);
  std::vector<float> x(n), y(n), z(n), fx(n), fy(n), fz(n);
  for (int i = 0; i < n; i++) { x[i] = uni(rng); y[i] = uni(rng); z[i] = uni(rng); }

  // Half stencil: self + 13 lexicographically-positive neighbor offsets.
  int offs[14][3], n_off = 0;
  for (int a = -1; a <= 1; a++)
    for (int b = -1; b <= 1; b++)
      for (int c = -1; c <= 1; c++)
        if (a > 0 || (a == 0 && (b > 0 || (b == 0 && c >= 0)))) {
          offs[n_off][0] = a; offs[n_off][1] = b; offs[n_off][2] = c; n_off++;
        }

  // Sorted contiguous cell storage (what CellListMap actually does —
  // cache-friendly runs, vectorizable inner loops), rebuilt every call.
  std::vector<int> counts(n_cells + 1), starts(n_cells + 1), order(n);
  std::vector<float> sx_(n), sy_(n), sz_(n), sfx(n), sfy(n), sfz(n);
  double energy = 0.0, t_total = 0.0;

  for (int call = -3; call < n_calls; call++) {  // 3 warmup calls
    auto t0 = std::chrono::steady_clock::now();
    // ---- build: counting sort by cell ----
    std::fill(counts.begin(), counts.end(), 0);
    for (int i = 0; i < n; i++) {
      int cx = std::min((int)(x[i] * inv_cell), m - 1);
      int cy = std::min((int)(y[i] * inv_cell), m - 1);
      int cz = std::min((int)(z[i] * inv_cell), m - 1);
      order[i] = (cx * m + cy) * m + cz;
      counts[order[i]]++;
    }
    starts[0] = 0;
    for (int c = 0; c < n_cells; c++) starts[c + 1] = starts[c] + counts[c];
    std::vector<int> fill = starts;
    std::vector<int> perm(n);
    for (int i = 0; i < n; i++) {
      int k = fill[order[i]]++;
      sx_[k] = x[i]; sy_[k] = y[i]; sz_[k] = z[i]; perm[k] = i;
    }
    // ---- sweep: half stencil over contiguous cell runs, Newton ----
    std::fill(sfx.begin(), sfx.end(), 0.f);
    std::fill(sfy.begin(), sfy.end(), 0.f);
    std::fill(sfz.begin(), sfz.end(), 0.f);
    energy = 0.0;
    for (int cx = 0; cx < m; cx++)
      for (int cy = 0; cy < m; cy++)
        for (int cz = 0; cz < m; cz++) {
          int c = (cx * m + cy) * m + cz;
          int i0 = starts[c], i1 = starts[c + 1];
          for (int s = 0; s < n_off; s++) {
            int nx = cx + offs[s][0], ny = cy + offs[s][1], nz = cz + offs[s][2];
            float shx = 0, shy = 0, shz = 0;  // periodic image shift
            if (nx >= m) { nx -= m; shx = L; } if (nx < 0) { nx += m; shx = -L; }
            if (ny >= m) { ny -= m; shy = L; } if (ny < 0) { ny += m; shy = -L; }
            if (nz >= m) { nz -= m; shz = L; } if (nz < 0) { nz += m; shz = -L; }
            int c2 = (nx * m + ny) * m + nz;
            int j0 = starts[c2], j1 = starts[c2 + 1];
            bool self = (s == 0);
            for (int i = i0; i < i1; i++) {
              float xi = sx_[i] - shx, yi = sy_[i] - shy, zi = sz_[i] - shz;
              float ax = 0, ay = 0, az = 0;
              for (int j = self ? i + 1 : j0; j < j1; j++) {
                float dx = xi - sx_[j];
                float dy = yi - sy_[j];
                float dz = zi - sz_[j];
                float r2 = dx * dx + dy * dy + dz * dz;
                if (r2 < rc2) {
                  float inv_r2 = 1.0f / r2;
                  float sr6 = inv_r2 * inv_r2 * inv_r2;  // sigma = 1
                  float sr12 = sr6 * sr6;
                  energy += 4.0f * (sr12 - sr6);
                  float f_over_r2 = 24.0f * (2.0f * sr12 - sr6) * inv_r2;
                  ax += f_over_r2 * dx; sfx[j] -= f_over_r2 * dx;
                  ay += f_over_r2 * dy; sfy[j] -= f_over_r2 * dy;
                  az += f_over_r2 * dz; sfz[j] -= f_over_r2 * dz;
                }
              }
              sfx[i] += ax; sfy[i] += ay; sfz[i] += az;
            }
          }
        }
    // Map forces back to particle order (part of the per-step cost).
    for (int k = 0; k < n; k++) {
      fx[perm[k]] = sfx[k]; fy[perm[k]] = sfy[k]; fz[perm[k]] = sfz[k];
    }
    auto t1 = std::chrono::steady_clock::now();
    if (call >= 0)
      t_total += std::chrono::duration<double, std::milli>(t1 - t0).count();
  }
  printf("{\"n\": %d, \"rho\": %.3f, \"rc\": %.2f, "
         "\"ms_per_call_1thread\": %.2f, \"energy\": %.4e}\n",
         n, rho, rc, t_total / n_calls, energy);
  return 0;
}
