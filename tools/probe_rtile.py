"""Device-time A/B of the fused spatial kernel's row tile.

Bigger tiles amortize the activated 2-row halos (ln_silu recompute is
(r+4)/r on ln1 + (r+2)/r on ln2 — 37% at r=8, 18% at r=16, 9% at r=32);
VMEM-64 (tuning.py default) leaves room far beyond the r=16 the shipped
tier rule picks. Runs r in {8, 16, 32} at the flagship's hot stages in
ONE program.

  tools/tpu_run.sh probe_rtile 2400 -- python tools/probe_rtile.py [N]
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

TILES = [8, 16, 32]


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.RandomState(0)
    cases = []
    for name, hw, cin, c in STAGES:
        x = jnp.asarray(rng.randn(n, hw, hw, cin).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        cases.append((x, make_params(rng, cin, c)))

    @jax.jit
    def program(sp):
        acc = jnp.float32(0.0)
        for (x, p) in sp:
            for r in TILES:
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_spatial_resblock_v2(x=xb, params=p, row_tile=r)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    print("backend:", jax.default_backend(), "| N =", n,
          "| per stage order:", TILES,
          "| stages:", [s[0] for s in STAGES])
    capture(lambda: float(program(tuple(cases))), "/tmp/vidtok_prof_rtile")
    parse("/tmp/vidtok_prof_rtile")


if __name__ == "__main__":
    main()
