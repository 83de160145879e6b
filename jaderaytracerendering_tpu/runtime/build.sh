#!/bin/sh
# Build the native scene runtime (SAH BVH builder + OBJ parser).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    -o libjade_native.so jade_native.cpp
echo "built $(pwd)/libjade_native.so"
