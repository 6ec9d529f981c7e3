#!/bin/sh
# Compile the reference NEPCPU engine (read-only sources) into a timing
# binary. Mirrors tools/golden_tachyon/build.sh: compile-at-bench-time,
# copy nothing into the repo.
set -e
SRC=/root/reference/extern/NEPCPU
OUT=${1:-/tmp/nepcpu_bench}
g++ -O3 -march=native -fopenmp -std=c++14 -I"$SRC" \
    "$(dirname "$0")/main.cpp" "$SRC/nep.cpp" "$SRC/ewald_nep.cpp" "$SRC/neighbor_nep.cpp" \
    -o "$OUT"
echo "$OUT"
