#!/bin/sh
# Build the native host-side library for the data pipeline.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -o libasr_native.so asr_native.cpp
echo "built $(pwd)/libasr_native.so"
