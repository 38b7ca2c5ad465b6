"""Attribute the fused spatial kernel's non-matmul overhead.

Post-silu_fast the flagship c128@256p block runs ~0.35 ms/slot against a
~0.20 ms tap-matmul bound (~43% overhead). This probe traces ablated
kernel variants (wrong numerics — attribution only) in ONE program:

  full        the production kernel
  noln        norm+silu replaced by identity (isolates ln cost)
  noshift     center-column taps only: 3 matmuls/conv, no W-shift copies
              (isolates pre-shift copy + 2/3 of matmul issue cost)
  noln+noshift  both (≈ DMA + residual + edge masks floor)
  noedge      frame-edge kill masks skipped

  tools/tpu_run.sh probe_spatial_attrib 2400 -- \
      python tools/probe_spatial_attrib.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402
from probe_spatial_shift import STAGES, make_params  # noqa: E402
from vidtok_tpu.ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2

ABLATIONS = ["", "noln", "noshift", "noln+noshift", "noedge"]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.RandomState(0)
    cases = []
    for name, hw, cin, c in STAGES[:2]:  # c128 + nin256 (the hot decode pair)
        x = jnp.asarray(rng.randn(n, hw, hw, cin).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        cases.append((x, make_params(rng, cin, c)))

    @jax.jit
    def program(cases):
        acc = jnp.float32(0.0)
        for (x, p) in cases:
            for ab in ABLATIONS:
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_spatial_resblock_v2(x=xb, params=p, ablate=ab)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    print(f"backend: {jax.default_backend()} | N = {n} | per stage order: "
          f"{ABLATIONS} | stages: {[s[0] for s in STAGES[:2]]}", flush=True)
    capture(lambda: float(program(tuple(cases))), "/tmp/vidtok_prof_attrib")
    parse("/tmp/vidtok_prof_attrib")


if __name__ == "__main__":
    main()
