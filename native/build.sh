#!/bin/bash
# Build the native host-runtime components.
set -e
cd "$(dirname "$0")"
CXXFLAGS="-O3 -march=native -shared -fPIC -std=c++17"
if g++ $CXXFLAGS -fopenmp vocab.cc -o libvocab.so 2>/dev/null; then
  echo "built libvocab.so (openmp)"
else
  g++ $CXXFLAGS vocab.cc -o libvocab.so
  echo "built libvocab.so (serial)"
fi
g++ $CXXFLAGS loader.cc -lz -lpthread -o libloader.so
echo "built libloader.so"
