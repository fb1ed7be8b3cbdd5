#!/bin/bash
# Build the first-party media decoder: native/libvidi_media.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -o libvidi_media.so vidi_media.cc \
    -lavformat -lavcodec -lavutil -lswscale -lswresample
echo "built $(pwd)/libvidi_media.so"
