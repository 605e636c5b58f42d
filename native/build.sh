#!/bin/sh
# Build the native data-loader core.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    gather_windows.cc -o libuplift_data.so
echo "built $(pwd)/libuplift_data.so"
