#!/bin/sh
# Build the native host kernels -> native/libfeonet_native.so
# (auto-invoked on first use by feonet_navier_stokes_tpu/_native.py;
# safe to re-run)
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -funroll-loops -shared -fPIC \
    -o libfeonet_native.so spai.cpp load.cpp
echo "built $(pwd)/libfeonet_native.so"
