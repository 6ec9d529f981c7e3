#!/bin/sh
# Compile the reference _eam + _neighbor OpenMP kernels (read-only sources,
# unmodified) into a standalone timing binary via the tools/ref_shim nanobind
# stub.  Compile-at-bench-time; nothing is copied into the repo.
set -e
HERE=$(dirname "$0")
OUT=${1:-/tmp/eam_bench}
g++ -O3 -march=native -fopenmp -std=c++17 \
    -I"$HERE/../ref_shim" -I/root/reference/src \
    "$HERE/main.cpp" /root/reference/src/eam.cpp /root/reference/src/neighbor.cpp \
    -Wl,--allow-multiple-definition \
    -o "$OUT"
echo "$OUT"
