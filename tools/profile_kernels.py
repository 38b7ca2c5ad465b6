"""Device-time comparison of fused-temporal kernel variants via the
profiler (wall timing over the axon relay is dispatch-dominated at ~3-5 ms
per call — see tools/microbench_temporal.py — so per-op truth must come
from traces).

Runs each variant inside ONE jitted program (chained through a token sum so
XLA cannot elide anything), captures a trace, and prints device ms per
pallas kernel / fusion.

  python tools/profile_kernels.py [C T S]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from microbench_temporal import copy_min, fused_diag, fused_fat  # noqa: E402
from profile_breakdown import capture, parse  # noqa: E402
from vidtok_tpu.ops.pallas.fused_temporal import fused_temporal_resblock


def main():
    C = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    S = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, T, S, S, C).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    params = {
        "norm1": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "norm2": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "conv1": {"kernel": jnp.asarray(rng.randn(3, 1, 1, C, C) * 0.02,
                                        jnp.float32),
                  "bias": jnp.zeros((C,))},
        "conv2": {"kernel": jnp.asarray(rng.randn(3, 1, 1, C, C) * 0.02,
                                        jnp.float32),
                  "bias": jnp.zeros((C,))},
    }

    fat_tile = 128 if C <= 256 else 64

    @jax.jit
    def program(x, params):
        acc = jnp.float32(0.0)
        o = fused_temporal_resblock(x, params)             # v0 shipped
        acc += jnp.sum(o.astype(jnp.float32))
        xb = x + acc * 1e-30                               # serialize
        o = fused_fat(xb, params, tile_s=fat_tile)         # fat matmul
        acc += jnp.sum(o.astype(jnp.float32))
        xb = x + acc * 1e-30
        o = fused_fat(xb, params, tile_s=fat_tile * 2)     # fat, 2x tile
        acc += jnp.sum(o.astype(jnp.float32))
        xb = x + acc * 1e-30
        o = fused_diag(xb, params, mode="copy")            # kernel copy
        acc += jnp.sum(o.astype(jnp.float32))
        xb = x + acc * 1e-30
        o = xb * 1.000001                                  # xla floor
        acc += jnp.sum(o.astype(jnp.float32))
        return acc

    trace_dir = "/tmp/vidtok_prof_kernels"
    capture(lambda: program(x, params), trace_dir)
    parse(trace_dir)


if __name__ == "__main__":
    main()
