"""Pallas TPU kernels + per-kernel enable switches.

The ``fused=True`` call flag routes blocks through these kernels; each kernel
is additionally gated here (A/B-measured defaults). Override with env vars
VIDTOK_FUSE_SPATIAL / VIDTOK_FUSE_TEMPORAL ("1"/"0").
"""

import os

# measured ~tied-or-slower than XLA on v5e (45.5 vs 49.2 fps) -> off
FUSE_SPATIAL = os.environ.get("VIDTOK_FUSE_SPATIAL", "0") == "1"
# aligned-tile kernel targeting the profiled norm/add HBM overhead -> on
FUSE_TEMPORAL = os.environ.get("VIDTOK_FUSE_TEMPORAL", "1") == "1"
