"""Device-time A/B of split-tile chain interleaving in the fused
temporal kernel.

The ablation probe (probe_temporal_attrib.log) puts ln_silu at ~62% of
the temporal grid step with the MXU mostly idle; bf16 stats probed
SLOWER (probe_silu_bf16s.log — Mosaic widens bf16 lane reductions).
``split=k`` python-unrolls the body over k independent column chains so
the instruction scheduler can overlap one chain's VPU ln with another's
MXU taps. Exact (bitwise — same ops per chain).

  tools/tpu_run.sh probe_split 2400 -- python tools/probe_split.py
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
SPLITS = [1, 2, 4]


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
            for split in SPLITS:
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_temporal_resblock(xb, p, split=split)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    print("backend:", jax.default_backend(), "| per stage order:", SPLITS,
          "| stages:", [s[0] for s in STAGES])
    capture(lambda: float(program(tuple(cases))), "/tmp/vidtok_prof_split")
    parse("/tmp/vidtok_prof_split")


if __name__ == "__main__":
    main()
