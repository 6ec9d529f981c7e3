#!/bin/sh
# Compile the reference _voronoi kernel + vendored voro++ (read-only
# sources, unmodified) into a standalone timing binary via tools/ref_shim.
set -e
HERE=$(dirname "$0")
OUT=${1:-/tmp/voro_bench}
VORO=/root/reference/extern/voro++/src
g++ -O3 -march=native -fopenmp -std=c++17 \
    -I"$HERE/../ref_shim" -I/root/reference/src -I"$VORO" \
    "$HERE/main.cpp" /root/reference/src/voronoi.cpp \
    "$VORO"/cell_2d.cc "$VORO"/cell_3d.cc "$VORO"/common.cc \
    "$VORO"/container_2d.cc "$VORO"/container_3d.cc "$VORO"/container_tri.cc \
    "$VORO"/iter_2d.cc "$VORO"/iter_3d.cc "$VORO"/particle_list.cc \
    "$VORO"/unitcell.cc "$VORO"/v_base_2d.cc "$VORO"/v_base_3d.cc \
    "$VORO"/v_compute_2d.cc \
    "$VORO"/v_compute_3d.cc "$VORO"/wall.cc "$VORO"/wall_2d.cc \
    "$VORO"/wall_3d.cc \
    -Wl,--allow-multiple-definition \
    -o "$OUT"
echo "$OUT"
