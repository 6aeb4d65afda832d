#!/bin/sh
# Build the native data loader -> native/libpaig_data.so
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    paig_data.cpp -o libpaig_data.so
echo "built $(pwd)/libpaig_data.so"
