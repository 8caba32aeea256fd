#!/usr/bin/env bash
# Build the native image-ops shared library next to this script.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -shared -fPIC -pthread \
    -o libicd_image_ops.so image_ops.cc
echo "built $(pwd)/libicd_image_ops.so"
