#!/bin/bash
# Build the reference libsrcnn (read-only at /root/reference) out-of-tree in
# /tmp, plus the raw-buffer oracle driver, for golden generation and CPU
# baseline measurement.  Mirrors Makefiles/Makefile.linux flags
# (-O2 -fopenmp -fPIC, default code path).
set -euo pipefail

REF=/root/reference/src
BUILD=${1:-/tmp/libsrcnn_ref}
mkdir -p "$BUILD"

g++ -c -fPIC -I"$REF" -fopenmp -O2 -o "$BUILD/frawscale.o" "$REF/frawscale.cpp"
g++ -c -fPIC -I"$REF" -fopenmp -O2 -o "$BUILD/libsrcnn.o" "$REF/libsrcnn.cpp"
ar rcs "$BUILD/libsrcnn.a" "$BUILD/frawscale.o" "$BUILD/libsrcnn.o"
g++ -I"$REF" -fopenmp -O2 -o "$BUILD/oracle_driver" \
    "$(dirname "$0")/oracle_driver.cpp" "$BUILD/libsrcnn.a"
echo "built $BUILD/oracle_driver"
