#!/bin/sh
# Build the native codec shared library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libtiffcodec.so tiffcodec.cpp
echo "built $(pwd)/libtiffcodec.so"
