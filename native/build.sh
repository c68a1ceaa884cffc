#!/bin/sh
# One-command build for the native (C++) OBJ loader + BVH builder.
# The Python bindings (minipath_tpu/scene/bvh/native.py) also compile this
# on demand (and rebuild when the source is newer); this script exists for
# fresh clones and CI. Artifacts land in native/build/ (gitignored).
set -e
cd "$(dirname "$0")"
mkdir -p build
g++ -O2 -std=c++17 -shared -fPIC minipath_native.cpp -o build/libminipath_native.so
echo "built build/libminipath_native.so"
