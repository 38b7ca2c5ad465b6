"""Attribute the fused temporal kernel's grid-step cost at flagship
decode shapes.

Step-time model (T=161 decode trace): up_temporal_0 blocks run 28.9 ms =
~56 us/grid step at tile [164, 128, 128], of which tap matmuls bound at
~21 us and in+out DMA at ~13 us — leaving ~35 us attributed to the two
ln_silu VPU passes. This probe traces ablated variants (wrong numerics —
attribution only) in ONE program:

  full     production kernel
  noln     ln_silu passes replaced by identity (isolates VPU pointwise)
  noconv   tap matmuls skipped (isolates VPU + DMA floor)
  noln+noconv  DMA + residual floor

Shapes: quarter-spatial level-0 decode block ([1,164,128x128,128]) and
the level-1 256ch block — full-spatial probes would need the whole 5.5 GB
activation.

  tools/tpu_run.sh probe_temporal_attrib 2400 -- \
      python tools/probe_temporal_attrib.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402
from probe_silu_fast import t_params  # noqa: E402
from vidtok_tpu.ops.pallas.fused_temporal import fused_temporal_resblock

STAGES = [
    ("t164_c128", 164, 128, 128),   # (T, HW, C) level-0 decode, 1/4 spatial
    ("t82_c256", 82, 64, 256),      # level-1, 1/4 spatial
]
ABLATIONS = ["", "noln", "noconv", "noln+noconv"]


def main():
    rng = np.random.RandomState(0)
    cases = []
    for name, t, hw, c in STAGES:
        x = jnp.asarray(rng.randn(1, t, hw, hw, c).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        cases.append((x, t_params(rng, c)))

    @jax.jit
    def program(tp):
        acc = jnp.float32(0.0)
        for (x, p) in tp:
            for ab in ABLATIONS:
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_temporal_resblock(xb, p, ablate=ab)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    print("backend:", jax.default_backend(),
          "| per stage order:", ABLATIONS,
          "| stages:", [s[0] for s in STAGES])
    trace_dir = "/tmp/vidtok_prof_tattrib"
    capture(lambda: float(program(tuple(cases))), trace_dir)
    parse(trace_dir)


if __name__ == "__main__":
    main()
