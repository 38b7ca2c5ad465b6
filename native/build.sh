#!/bin/sh
# Build the native video ingest library.
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -o libvidtok_ingest.so video_ingest.cc \
    -lavformat -lavcodec -lavutil -lswscale
echo "built $(pwd)/libvidtok_ingest.so"
