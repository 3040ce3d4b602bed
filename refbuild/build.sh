#!/bin/sh
# Out-of-tree build of the reference C++ engine (Sorax5/RaytracingEngine).
# The reference ships only an MSVC solution; this reproduces its Release x64
# config (C++20, O2, OpenMP — RaytracingEngine.vcxproj:134-135) with g++.
# Nothing under /root/reference is modified.
set -e
REF=/root/reference/RaytracingEngine
cd "$(dirname "$0")"
g++ -O2 -std=c++20 -fopenmp -I"$REF" \
    "$REF/RaytracingEngine.cpp" "$REF/Image.cpp" tinyobj_impl.cpp \
    -o rte_reference
echo "built: $(pwd)/rte_reference"
