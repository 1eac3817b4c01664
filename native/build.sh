#!/bin/sh
# Build the native runtime pieces (C++ -> shared libs loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -shared -fPIC -o libframesink.so framesink.cpp -lz -lpthread
g++ -O2 -std=c++17 -shared -fPIC -o libvideosink.so videosink.cpp -lpthread
echo "built native/libframesink.so native/libvideosink.so"
