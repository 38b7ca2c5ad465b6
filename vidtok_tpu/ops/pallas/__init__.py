"""Pallas TPU kernels + per-kernel enable switches.

The ``fused=True`` call flag routes blocks through these kernels; each kernel
is additionally gated here (A/B-measured defaults). Override with env var
VIDTOK_FUSE_TEMPORAL ("1"/"0").
"""

import os

# A hand-fused spatial resblock kernel was measured tied-or-slower than XLA
# on v5e (unaligned halo slices force Mosaic relayouts; see BENCH_NOTES.md
# "Hand-fused Pallas SPATIAL blocks") and was removed — XLA's conv + fusion
# is the shipped spatial path.
# aligned-tile kernel targeting the profiled norm/add HBM overhead -> on
FUSE_TEMPORAL = os.environ.get("VIDTOK_FUSE_TEMPORAL", "1") == "1"
