// Baseline timing harness: the reference _voronoi kernel (voro++ backed,
// compiled UNMODIFIED from the read-only sources through tools/ref_shim)
// on an FCC Cu block.  usage: voro_bench <nrep> [reps] [threads]
#include "type.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

void get_voronoi_volume_number_radius(const ROneArrayD, const ROneArrayD,
                                      const ROneArrayD, const RTwoArrayD,
                                      const ROneArrayD, const ROneArrayI,
                                      OneArrayD, OneArrayI, OneArrayD,
                                      const int);

int main(int argc, char **argv) {
  int nrep = argc > 1 ? std::atoi(argv[1]) : 63;
  int reps = argc > 2 ? std::atoi(argv[2]) : 3;
  int num_t = argc > 3 ? std::atoi(argv[3]) : 2;
  const double a = 3.615;
  const int n = 4 * nrep * nrep * nrep;
  const double base[12] = {0, 0, 0, 0, .5, .5, .5, 0, .5, .5, .5, 0};
  std::vector<double> x(n), y(n), z(n);
  int k = 0;
  for (int ix = 0; ix < nrep; ix++)
    for (int iy = 0; iy < nrep; iy++)
      for (int iz = 0; iz < nrep; iz++)
        for (int b = 0; b < 4; b++) {
          x[k] = (ix + base[3 * b]) * a;
          y[k] = (iy + base[3 * b + 1]) * a;
          z[k] = (iz + base[3 * b + 2]) * a;
          k++;
        }
  const double L = nrep * a;
  double boxm[9] = {L, 0, 0, 0, L, 0, 0, 0, L};
  double origin[3] = {0, 0, 0};
  int boundary[3] = {1, 1, 1};
  std::vector<double> vol(n), crad(n);
  std::vector<int> nn(n);
  ROneArrayD xs(x.data(), {(size_t)n}), ys(y.data(), {(size_t)n}),
      zs(z.data(), {(size_t)n});
  RTwoArrayD boxa(boxm, {3, 3});
  ROneArrayD orig(origin, {3});
  ROneArrayI bnd(boundary, {3});
  OneArrayD vola(vol.data(), {(size_t)n});
  OneArrayI nna(nn.data(), {(size_t)n});
  OneArrayD crada(crad.data(), {(size_t)n});
  get_voronoi_volume_number_radius(xs, ys, zs, boxa, orig, bnd, vola, nna,
                                   crada, num_t);
  double best = 1e30;
  for (int r = 0; r < reps; r++) {
    auto t0 = std::chrono::steady_clock::now();
    get_voronoi_volume_number_radius(xs, ys, zs, boxa, orig, bnd, vola, nna,
                                     crada, num_t);
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();
    if (dt < best) best = dt;
  }
  double vtot = 0;
  long nntot = 0;
  for (int i = 0; i < n; i++) { vtot += vol[i]; nntot += nn[i]; }
  printf("{\"mode\": \"voronoi\", \"n\": %d, \"seconds\": %.4f, "
         "\"vol_total\": %.3f, \"nn_mean\": %.3f}\n",
         n, best, vtot, (double)nntot / n);
  return 0;
}
