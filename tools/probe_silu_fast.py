"""Device-time A/B of the fused kernels' ln_silu implementation.

``act.ln_silu_fast`` keeps the moment stats in f32 but runs normalize +
SiLU (tanh form) in bf16 lanes — 2x VPU throughput on the pointwise work
that the round-4 step-time accounting puts at ~25-50% of the temporal
kernel's grid step and ~30% of the spatial kernel's. Runs exact-f32 and
fast variants of each kernel inside ONE jitted program at the flagship's
hottest stage shapes and prints per-pallas-call device ms.

  python tools/probe_silu_fast.py [N]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402
from probe_spatial_shift import STAGES, make_params  # noqa: E402
from vidtok_tpu.ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2
from vidtok_tpu.ops.pallas.fused_temporal import fused_temporal_resblock

# temporal stages by T=161 trace heat: level-0 enc/dec (26 ms each),
# level-1 (7.5/15 ms), level-2 512ch
TEMPORAL = [
    ("t_c128", 40, 128, 128),   # (T, HW, C)
    ("t_c256", 20, 64, 256),
    ("t_c512", 10, 32, 512),
]


def t_params(rng, c):
    return {
        "norm1": {"scale": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
                  "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32)},
        "conv1": {"kernel": jnp.asarray(rng.randn(3, 1, 1, c, c) * 0.02,
                                        jnp.float32),
                  "bias": jnp.asarray(rng.randn(c) * 0.01, jnp.float32)},
        "norm2": {"scale": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
                  "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32)},
        "conv2": {"kernel": jnp.asarray(rng.randn(3, 1, 1, c, c) * 0.02,
                                        jnp.float32),
                  "bias": jnp.asarray(rng.randn(c) * 0.01, jnp.float32)},
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.RandomState(0)
    sp_cases = []
    for name, hw, cin, c in STAGES:
        x = jnp.asarray(rng.randn(n, hw, hw, cin).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        sp_cases.append((x, make_params(rng, cin, c)))
    tp_cases = []
    for name, t, hw, c in TEMPORAL:
        x = jnp.asarray(rng.randn(1, t, hw, hw, c).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        tp_cases.append((x, t_params(rng, c)))

    @jax.jit
    def program(sp, tp):
        acc = jnp.float32(0.0)
        for (x, p) in sp:
            for fast in (False, True, "mxu", "bf16"):
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_spatial_resblock_v2(x=xb, params=p,
                                              silu_fast=fast)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        for (x, p) in tp:
            for fast in (False, True, "mxu", "bf16"):
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_temporal_resblock(xb, p, silu_fast=fast)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    print("backend:", jax.default_backend(), "| N =", n,
          "| per stage order: f32, fast, mxu, bf16 | stages:",
          [s[0] for s in STAGES] + [s[0] for s in TEMPORAL])
    capture(functools.partial(program, tuple(sp_cases), tuple(tp_cases)),
            "/tmp/vidtok_prof_silu_fast")
    parse("/tmp/vidtok_prof_silu_fast")


if __name__ == "__main__":
    main()
