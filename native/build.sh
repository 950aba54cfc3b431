#!/bin/sh
# Build the native data-layer library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    vlgp_native.cpp -o libvlgp_native.so
echo "built $(pwd)/libvlgp_native.so"
