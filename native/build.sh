#!/bin/sh
# Builds the native IO library next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libscaloam_io.so scaloam_io.cpp
echo "built $(pwd)/libscaloam_io.so"
