#!/usr/bin/env bash
# Build the native data-plane library (JPEG decode + antialiased resize).
set -euo pipefail
cd "$(dirname "$0")/.."
mkdir -p calm_vit_dte_tpu/native_lib
g++ -O3 -fPIC -shared -std=c++17 -march=native \
    -o calm_vit_dte_tpu/native_lib/libcalmdata.so \
    native/decoder.cpp -ljpeg -lpthread
echo "built calm_vit_dte_tpu/native_lib/libcalmdata.so"
