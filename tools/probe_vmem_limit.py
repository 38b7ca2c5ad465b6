"""Probe: does raising --xla_tpu_scoped_vmem_limit_kib reach the relay?

v5e has 128 MiB of VMEM per core; Mosaic's scoped-VMEM compile limit
defaults to 16 MiB, which is what rejected the r=16 spatial tiles
(17.5 MB, BENCH_NOTES round-2) and the long-T temporal tiles. If the
client-side XLA_FLAGS propagate through the axon relay's server-side
compile, raising the limit unlocks bigger tiles for every fused kernel.

Run with the flag and without:
  XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 \
      python tools/probe_vmem_limit.py
Compiles a spatial-v2 call at the known-rejected shape (cin=c=128,
w=256, row_tile=16) — success means the flag propagates.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vidtok_tpu.ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2

print("XLA_FLAGS =", os.environ.get("XLA_FLAGS"))


def arr(key, *s):
    return (jax.random.normal(jax.random.PRNGKey(key), s, jnp.float32)
            * 0.05).astype(jnp.bfloat16)


def main():
    n, h, w, c = 8, 256, 256, 128
    x = arr(0, n, h, w, c)
    p = {"norm1": {"scale": arr(1, c), "bias": arr(2, c)},
         "conv1": {"kernel": arr(3, 1, 3, 3, c, c), "bias": arr(4, c)},
         "norm2": {"scale": arr(5, c), "bias": arr(6, c)},
         "conv2": {"kernel": arr(7, 1, 3, 3, c, c), "bias": arr(8, c)}}
    fn = jax.jit(lambda x, p: fused_spatial_resblock_v2(
        x, p, row_tile=16, interpret=False))
    try:
        out = fn(x, p)
        print("r=16 @ 128ch/W=256:", "SKIP (None)" if out is None else
              f"COMPILED ok, sum={float(jnp.sum(out.astype(jnp.float32))):.3f}")
    except Exception as e:
        print(f"r=16 @ 128ch/W=256: FAIL {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
