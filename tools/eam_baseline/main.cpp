// Baseline timing harness: the reference _eam and _neighbor OpenMP kernels
// (compiled UNMODIFIED from the read-only /root/reference/src sources through
// the tools/ref_shim nanobind stub) driven on an FCC Cu block.  Used only to
// produce vs-reference wall-times for bench.py; nothing from the reference is
// copied into the package.
//
// usage: eam_bench <mode:eam|neighbor> <nrep> <file-or-rc> [reps] [threads]
//   eam:      timed section = build_neighbor + EAM::calculate (matches the
//             Python-side eam_force_256k_s, which rebuilds the list per call)
//   neighbor: timed section = build_neighbor only
#include "eam.h"
#include "box.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <vector>

// free functions from the reference neighbor.cpp (declared here; defined in
// the compiled translation unit)
void build_neighbor(const ROneArrayD, const ROneArrayD, const ROneArrayD,
                    const RTwoArrayD, const ROneArrayD, const ROneArrayI,
                    const double, TwoArrayI, TwoArrayD, OneArrayI, const int);

struct Setfl {
  int nelem, nrho, nr;
  double drho, dr, rc;
  std::vector<double> F;     // (nelem, nrho)
  std::vector<double> rho;   // (nelem, nr)
  std::vector<double> rphi;  // (nelem, nelem, nr)
};

static Setfl read_setfl(const std::string &path) {
  std::ifstream f(path);
  if (!f) { fprintf(stderr, "cannot open %s\n", path.c_str()); exit(1); }
  std::string line;
  for (int i = 0; i < 3; i++) std::getline(f, line);
  std::getline(f, line);
  Setfl t;
  { std::istringstream ss(line); ss >> t.nelem; }
  std::getline(f, line);
  { std::istringstream ss(line); ss >> t.nrho >> t.drho >> t.nr >> t.dr >> t.rc; }
  t.F.resize((size_t)t.nelem * t.nrho);
  t.rho.resize((size_t)t.nelem * t.nr);
  t.rphi.assign((size_t)t.nelem * t.nelem * t.nr, 0.0);
  auto read_n = [&](double *dst, long count) {
    long got = 0;
    while (got < count && f >> dst[got]) got++;
    if (got < count) { fprintf(stderr, "truncated setfl\n"); exit(1); }
  };
  for (int e = 0; e < t.nelem; e++) {
    // per-element info line (skip whitespace left by >> first)
    f >> std::ws;
    std::getline(f, line);
    read_n(&t.F[(size_t)e * t.nrho], t.nrho);
    read_n(&t.rho[(size_t)e * t.nr], t.nr);
  }
  for (int i = 0; i < t.nelem; i++)
    for (int j = 0; j <= i; j++) {
      std::vector<double> tmp(t.nr);
      read_n(tmp.data(), t.nr);
      for (int k = 0; k < t.nr; k++) {
        t.rphi[((size_t)i * t.nelem + j) * t.nr + k] = tmp[k];
        t.rphi[((size_t)j * t.nelem + i) * t.nr + k] = tmp[k];
      }
    }
  return t;
}

int main(int argc, char **argv) {
  std::string mode = argc > 1 ? argv[1] : "eam";
  int nrep = argc > 2 ? std::atoi(argv[2]) : 40;
  std::string arg3 = argc > 3 ? argv[3] : "/tmp/Cu.eam.alloy";
  int reps = argc > 4 ? std::atoi(argv[4]) : 3;
  int num_t = argc > 5 ? std::atoi(argv[5]) : 2;

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

  double rc = 5.0;
  Setfl tab;
  if (mode == "eam") {
    tab = read_setfl(arg3);
    rc = tab.rc;
  } else {
    rc = std::atof(arg3.c_str());
  }

  const int max_neigh = 96;
  std::vector<int> verlet((size_t)n * max_neigh), nn(n);
  std::vector<double> dist((size_t)n * max_neigh);
  std::vector<double> force((size_t)n * 3), virial((size_t)n * 9), energy(n);
  std::vector<int> types(n, 0);

  ROneArrayD xs(x.data(), {(size_t)n}), ys(y.data(), {(size_t)n}),
      zs(z.data(), {(size_t)n});
  RTwoArrayD boxa(boxm, {3, 3});
  ROneArrayD orig(origin, {3});
  ROneArrayI bnd(boundary, {3});
  TwoArrayI verleta(verlet.data(), {(size_t)n, (size_t)max_neigh});
  TwoArrayD dista(dist.data(), {(size_t)n, (size_t)max_neigh});
  OneArrayI nna(nn.data(), {(size_t)n});
  ROneArrayI typesa(types.data(), {(size_t)n});
  TwoArrayD forcea(force.data(), {(size_t)n, 3});
  TwoArrayD viriala(virial.data(), {(size_t)n, 9});
  OneArrayD energya(energy.data(), {(size_t)n});

  double best = 1e30;
  if (mode == "neighbor") {
    build_neighbor(xs, ys, zs, boxa, orig, bnd, rc, verleta, dista, nna, num_t);
    for (int r = 0; r < reps; r++) {
      auto t0 = std::chrono::steady_clock::now();
      build_neighbor(xs, ys, zs, boxa, orig, bnd, rc, verleta, dista, nna,
                     num_t);
      double dt = std::chrono::duration<double>(
                      std::chrono::steady_clock::now() - t0).count();
      if (dt < best) best = dt;
    }
    long mx = 0;
    for (int i = 0; i < n; i++) mx = std::max(mx, (long)nn[i]);
    printf("{\"mode\": \"neighbor\", \"n\": %d, \"rc\": %.3f, \"seconds\": "
           "%.4f, \"max_neigh\": %ld}\n", n, rc, best, mx);
    return 0;
  }

  RTwoArrayD Fa(tab.F.data(), {(size_t)tab.nelem, (size_t)tab.nrho});
  RTwoArrayD rhoa(tab.rho.data(), {(size_t)tab.nelem, (size_t)tab.nr});
  RThreeArrayD rphia(tab.rphi.data(),
                     {(size_t)tab.nelem, (size_t)tab.nelem, (size_t)tab.nr});
  EAM eam(tab.rc, tab.dr, tab.drho, Fa, rhoa, rphia);
  // warm
  build_neighbor(xs, ys, zs, boxa, orig, bnd, rc, verleta, dista, nna, num_t);
  std::fill(force.begin(), force.end(), 0.0);
  std::fill(virial.begin(), virial.end(), 0.0);
  std::fill(energy.begin(), energy.end(), 0.0);
  eam.calculate(xs, ys, zs, typesa, boxa, orig, bnd, verleta, dista, nna,
                forcea, viriala, energya, num_t);
  for (int r = 0; r < reps; r++) {
    auto t0 = std::chrono::steady_clock::now();
    build_neighbor(xs, ys, zs, boxa, orig, bnd, rc, verleta, dista, nna,
                   num_t);
    std::fill(force.begin(), force.end(), 0.0);
    std::fill(virial.begin(), virial.end(), 0.0);
    std::fill(energy.begin(), energy.end(), 0.0);
    eam.calculate(xs, ys, zs, typesa, boxa, orig, bnd, verleta, dista, nna,
                  forcea, viriala, energya, num_t);
    double dt = std::chrono::duration<double>(
                    std::chrono::steady_clock::now() - t0).count();
    if (dt < best) best = dt;
  }
  double e = 0;
  for (double v : energy) e += v;
  printf("{\"mode\": \"eam\", \"n\": %d, \"seconds\": %.4f, \"energy\": %.6f, "
         "\"e_per_atom\": %.6f}\n", n, best, e, e / n);
  return 0;
}
