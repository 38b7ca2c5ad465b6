#!/usr/bin/env bash
# Round-4b streaming-serving sweep: find the best scan-stream/multistream
# serving configuration now that the streaming kernel paths land
# (scan-stream S=4: encode 378.8 / decode 159.0 aggregate fps).
set -u
cd "$(dirname "$0")/.."
RUN=tools/tpu_run.sh

# single-stream fused A/B: decides the fused_streaming DEFAULT
$RUN scanstream_s1_xla 5400 -- env VIDTOK_SCANSTREAM=1 \
  python tools/bench_suite.py scanstream
$RUN scanstream_s1_fused 5400 -- env VIDTOK_SCANSTREAM=1 \
  VIDTOK_FUSED_STREAMING=1 python tools/bench_suite.py scanstream

# wider decode chunks (8 latents/step) and more streams
$RUN scanstream_s4_tc8 5400 -- env VIDTOK_SCANSTREAM=4 VIDTOK_SCAN_TCDEC=8 \
  VIDTOK_FUSED_STREAMING=1 python tools/bench_suite.py scanstream
$RUN scanstream_s8 5400 -- env VIDTOK_SCANSTREAM=8 \
  VIDTOK_FUSED_STREAMING=1 python tools/bench_suite.py scanstream
