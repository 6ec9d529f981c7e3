#!/bin/bash
# Build the reference Tachyon CPU renderer + golden driver (dev-time only).
set -e
cd "$(dirname "$0")"
TSRC=/root/reference/extern/tachyon/src
OUT=build
mkdir -p $OUT
if [ ! -f $OUT/libtachyon.a ]; then
  for f in api apigeom apitrigeom box camera coordsys cylinder extvol global \
           grid hash imageio imap intersect jpeg light parallel plane pngfile \
           ppm psd quadric render ring sgirgb shade sphere texture tgafile \
           threads trace triangle ui util vector vol winbmp; do
    gcc -O2 -fPIC -DTACHYON_NO_DEPRECATED -DTHR -D_REENTRANT -DLinux \
        -I$TSRC -c $TSRC/$f.c -o $OUT/$f.o
  done
  ar rcs $OUT/libtachyon.a $OUT/*.o
fi
g++ -O2 -I/root/reference/src -I$TSRC driver.cpp $OUT/libtachyon.a -lpthread -lm -o $OUT/golden_driver
echo "built $OUT/golden_driver"
