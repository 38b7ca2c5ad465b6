"""Device-time sweep of the fused temporal kernel's spatial tile width.

The T=201 protocol bench ran FASTER per slot than T=161 (6.52 vs 6.77
ms) even though its longer T forces the temporal kernels' tile_s from
128 down to 64 under the VMEM budget — suggesting the long-standing
tile_s=128 default is NOT optimal at serving T. Sweep tile_s at the
flagship level-0/level-1 shapes.

  tools/tpu_run.sh probe_ttile 2400 -- python tools/probe_ttile.py
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
    ("t164_c128", 164, 128, 128),   # level-0 decode, 1/4 spatial
    ("t82_c256", 82, 64, 256),
]
TILES = [32, 64, 128]


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
            for tile in TILES:
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_temporal_resblock(xb, p, tile_s=tile)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    print("backend:", jax.default_backend(), "| per stage order:", TILES,
          "| stages:", [s[0] for s in STAGES])
    capture(lambda: float(program(tuple(cases))), "/tmp/vidtok_prof_ttile")
    parse("/tmp/vidtok_prof_ttile")


if __name__ == "__main__":
    main()
