#!/bin/sh
# Build the native data-pipeline kernels (no dependencies beyond libstdc++).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libfastops.so fastops.cpp
echo "built $(pwd)/libfastops.so"
