// Baseline timing harness: reference NEPCPU (compiled from
// /root/reference/extern/NEPCPU, unmodified) force call on an FCC Cu block.
// Used only to produce the vs-reference wall-time for bench.py; nothing from
// the reference is copied into the package.
#include "nep.h"
#include <chrono>
#include <cstdio>
#include <string>
#include <vector>

int main(int argc, char** argv) {
  int nrep = argc > 1 ? std::atoi(argv[1]) : 40;
  int reps = argc > 3 ? std::atoi(argv[3]) : 3;
  std::string model = argc > 2 ? argv[2] : "/root/reference/tests/input_files/UNEP-v1.txt";
  double a = 3.615;
  int n = 4 * nrep * nrep * nrep;
  std::vector<double> base = {0,0,0, 0,.5,.5, .5,0,.5, .5,.5,0};
  std::vector<double> pos(3 * n);
  int k = 0;
  for (int ix = 0; ix < nrep; ix++)
    for (int iy = 0; iy < nrep; iy++)
      for (int iz = 0; iz < nrep; iz++)
        for (int b = 0; b < 4; b++) {
          pos[k] = (ix + base[3*b]) * a;
          pos[n + k] = (iy + base[3*b+1]) * a;
          pos[2*n + k] = (iz + base[3*b+2]) * a;
          k++;
        }
  double L = nrep * a;
  std::vector<double> box = {L,0,0, 0,L,0, 0,0,L};
  // UNEP-v1 type order: ... Cu is index 4
  NEP calc(model);
  int cu = 4;
  for (size_t i = 0; i < calc.element_list.size(); i++)
    if (calc.element_list[i] == std::string("Cu")) cu = (int)i;
  std::vector<int> type(n, cu);
  std::vector<double> pot(n), force(3 * n), virial(9 * n);
  calc.compute(type, box, pos, pot, force, virial);  // warm
  double best = 1e30;
  for (int r = 0; r < reps; r++) {
    auto t0 = std::chrono::steady_clock::now();
    calc.compute(type, box, pos, pot, force, virial);
    double dt = std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
    if (dt < best) best = dt;
  }
  double e = 0; for (double v : pot) e += v;
  printf("{\"n\": %d, \"seconds\": %.4f, \"energy\": %.6f}\n", n, best, e);
  return 0;
}
