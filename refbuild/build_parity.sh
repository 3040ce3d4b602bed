#!/bin/sh
# Build the parity-dump driver (refbuild/parity_main.cpp) against the
# UNMODIFIED reference headers, then (optionally) regenerate the HDR dumps
# the full-resolution parity tests read.
#
#   sh refbuild/build_parity.sh          # build rte_parity only
#   sh refbuild/build_parity.sh dumps    # build + regenerate all 4 dumps
set -e
REF=/root/reference/RaytracingEngine
cd "$(dirname "$0")"
g++ -O2 -std=c++20 -fopenmp -I"$REF" parity_main.cpp -o rte_parity
echo "built: $(pwd)/rte_parity"
if [ "$1" = "dumps" ]; then
    ./rte_parity
fi
