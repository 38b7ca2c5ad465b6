"""Probe: can Mosaic's scoped-VMEM limit be raised through the relay?

v5e has 128 MiB of VMEM per core; Mosaic's scoped-VMEM compile limit
defaults to 16 MiB, which is what rejected the r=16 spatial tiles
(17.5 MB, BENCH_NOTES round-2) and the long-T temporal tiles (round-3).

Route 1 (client XLA_FLAGS --xla_tpu_scoped_vmem_limit_kib) is DEAD: the
local XLA build aborts at startup with "Unknown flag" — the TPU flag
does not exist client-side and never reaches the relay.

Route 2 (this probe): pallas_call ``compiler_params=
pltpu.CompilerParams(vmem_limit_bytes=...)`` travels inside the kernel
payload to the server-side Mosaic compile. The kernels read it from the
``VIDTOK_VMEM_LIMIT_MB`` env var (ops/pallas/tuning.py), which also
proportionally relaxes the 16 MiB-calibrated block budgets.

  VIDTOK_VMEM_LIMIT_MB=64 python tools/probe_vmem_limit.py

Compiles (a) a spatial-v2 call at the known-rejected shape (cin=c=128,
w=256, row_tile=16) and (b) a fused_temporal call at the known-rejected
long-T shape (t=36, tile_s=128, c=256 — 1,179,648 block elements, the
T=161 serving graph's natural tile). Success on hardware means the
raised limit propagates and the budget caps can move.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vidtok_tpu.ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2
from vidtok_tpu.ops.pallas.fused_temporal import fused_temporal_resblock
from vidtok_tpu.ops.pallas import tuning

print("VIDTOK_VMEM_LIMIT_MB =", tuning.vmem_limit_mb(),
      "| budget_scale =", tuning.budget_scale(),
      "| platform =", jax.devices()[0].platform)


def arr(key, *s):
    return (jax.random.normal(jax.random.PRNGKey(key), s, jnp.float32)
            * 0.05).astype(jnp.bfloat16)


def probe(name, fn, *args):
    try:
        out = fn(*args)
        if out is None:
            print(f"{name}: SKIP (shape gate returned None)")
        else:
            print(f"{name}: COMPILED ok, "
                  f"sum={float(jnp.sum(out.astype(jnp.float32))):.3f}")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")


def main():
    which = sys.argv[1:] or ["spatial", "temporal"]

    if "spatial" in which:
        n, h, w, c = 8, 256, 256, 128
        x = arr(0, n, h, w, c)
        p = {"norm1": {"scale": arr(1, c), "bias": arr(2, c)},
             "conv1": {"kernel": arr(3, 1, 3, 3, c, c), "bias": arr(4, c)},
             "norm2": {"scale": arr(5, c), "bias": arr(6, c)},
             "conv2": {"kernel": arr(7, 1, 3, 3, c, c), "bias": arr(8, c)}}
        fn = jax.jit(lambda x, p: fused_spatial_resblock_v2(
            x, p, row_tile=16, interpret=False))
        probe("spatial r=16 @ 128ch/W=256", fn, x, p)

    if "temporal" in which:
        b, t, h, w, c = 1, 36, 32, 4, 256   # H*W=128 -> tile_s=128
        x = arr(10, b, t, h, w, c)
        p = {"norm1": {"scale": arr(11, c), "bias": arr(12, c)},
             "conv1": {"kernel": arr(13, 3, 1, 1, c, c), "bias": arr(14, c)},
             "norm2": {"scale": arr(15, c), "bias": arr(16, c)},
             "conv2": {"kernel": arr(17, 3, 1, 1, c, c), "bias": arr(18, c)}}
        fn = jax.jit(lambda x, p: fused_temporal_resblock(
            x, p, tile_s=128, interpret=False))
        probe("temporal t=36/tile128/c=256 (1.18M elts)", fn, x, p)


if __name__ == "__main__":
    main()
