#!/bin/sh
# Build the native host-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 loader.cc -ljpeg -o libhctpu_loader.so
echo "built $(pwd)/libhctpu_loader.so"
