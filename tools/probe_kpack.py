"""Device-time A/B of K-packed tap matmuls in the fused kernels.

``kpack`` lane-concatenates the tap-shifted operand views so each conv
runs 3 (spatial, K=3Ci) or 1 (temporal, K=3C) deep-K matmuls instead of
9/3 shallow ones — fewer MXU issues and f32 accumulator read-modify-
writes, at the cost of one lane-aligned VMEM concat per conv (the shifted
copies already exist in the pre_shift form). Exact vs baseline to 2e-6
(CPU interpret check in the kernels' unit tests).

Runs baseline and kpack variants of each kernel inside ONE jitted program
at the flagship's hottest stage shapes and prints per-pallas-call device
ms (order per stage: baseline, kpack).

  tools/tpu_run.sh probe_kpack 2400 -- python tools/probe_kpack.py [N]
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
from probe_silu_fast import TEMPORAL, t_params  # noqa: E402
from vidtok_tpu.ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2
from vidtok_tpu.ops.pallas.fused_temporal import fused_temporal_resblock


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
            for kpack in (False, True):
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_spatial_resblock_v2(x=xb, params=p, kpack=kpack)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        for (x, p) in tp:
            for kpack in (False, True):
                xb = x + acc.astype(x.dtype) * 1e-30
                o = fused_temporal_resblock(xb, p, kpack=kpack)
                assert o is not None
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    sp = tuple(sp_cases)
    tp = tuple(tp_cases)
    print("backend:", jax.default_backend(), "| N =", n,
          "| per stage order: baseline, kpack |",
          "stages:", [s[0] for s in STAGES] + [t[0] for t in TEMPORAL])
    trace_dir = "/tmp/vidtok_prof_kpack"
    capture(lambda: float(program(sp, tp)), trace_dir)
    parse(trace_dir)


if __name__ == "__main__":
    main()
