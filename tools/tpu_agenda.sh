#!/usr/bin/env bash
# Round-4 TPU measurement agenda (VERDICT round-3 items 1-4), re-created
# from the round-3 /tmp queue as a COMMITTED artifact (item 5). Every job
# goes through tools/tpu_run.sh (single-tenant lock + journal, item 6).
#
# Waves (run selected waves: tools/tpu_agenda.sh A B C):
#   A  scoreboard: bf16+fused serving parity (BASELINE metric #2) +
#      probes that direct the 150-fps per-slot campaign.
#   B  T=161 device traces (encode/decode) — the arbiter for the
#      low-intensity tail identified by the round-3 FLOP accounting.
#   C  bench_suite sections never yet run on hardware: multistream,
#      scan-stream, vidtwin, and the streaming-chunk refresh.
set -u
cd "$(dirname "$0")/.."
RUN=tools/tpu_run.sh
WAVES="${*:-A}"

if [[ "$WAVES" == *A* ]]; then
  # torch-stage NPZ is CPU-side; regenerate if the tmpfs was recycled.
  if [[ ! -f /tmp/parity_psnr_torch.npz ]]; then
    env -u PYTHONPATH JAX_PLATFORMS=cpu \
      python tools/parity_psnr.py torch /tmp/parity_psnr_torch.npz
  fi
  $RUN parity_serving 3600 -- \
    python tools/parity_psnr.py jax serving /tmp/parity_psnr_torch.npz
  $RUN probe_vmem64 2400 -- env VIDTOK_VMEM_LIMIT_MB=64 \
    python tools/probe_vmem_limit.py
  $RUN probe_silu_bf16 2400 -- python tools/probe_silu_bf16.py
fi

if [[ "$WAVES" == *B* ]]; then
  $RUN trace_decode_t161 3600 -- env VIDTOK_PROF_T=161 \
    python tools/profile_breakdown.py decode
  $RUN trace_encode_t161 3600 -- env VIDTOK_PROF_T=161 \
    python tools/profile_breakdown.py encode
fi

if [[ "$WAVES" == *C* ]]; then
  $RUN bench_multistream 5400 -- \
    python tools/bench_suite.py multistream
  $RUN bench_scanstream 5400 -- \
    python tools/bench_suite.py scanstream
  $RUN bench_vidtwin 5400 -- \
    python tools/bench_suite.py vidtwin
  $RUN bench_streamchunks 5400 -- \
    python tools/bench_suite.py stream streamdec streamdec_overlap
fi

# Wave D (round-4b): fresh traces at the CURRENT default stack
# (silu_fast + tail tap-pack + VMEM-64), the two probes that direct the
# remaining ~48 ms/call to 150 fps, and the first streaming runs with the
# CORRECT fused gate name (VIDTOK_FUSED_STREAMING — prior runs used
# VIDTOK_FUSE_STREAMING and silently measured the XLA graphs).
if [[ "$WAVES" == *D* ]]; then
  $RUN trace_decode_t161_v2 3600 -- env VIDTOK_PROF_T=161 \
    python tools/profile_breakdown.py decode
  $RUN trace_encode_t161_v2 3600 -- env VIDTOK_PROF_T=161 \
    python tools/profile_breakdown.py encode
  $RUN probe_spatial_attrib 2400 -- python tools/probe_spatial_attrib.py 20
  $RUN probe_convin_s2d 2400 -- python tools/probe_convin_im2col.py 166
  $RUN scanstream_s4_fstream 5400 -- env VIDTOK_SCANSTREAM=4 \
    VIDTOK_FUSED_STREAMING=1 python tools/bench_suite.py scanstream
  $RUN multistream_s4_fstream 5400 -- env VIDTOK_MULTISTREAM=4 \
    VIDTOK_FUSED_STREAMING=1 python tools/bench_suite.py multistream
fi
