"""Device-time A/B of the decoder-tail kernel variants at flagship shape.

The T=161 decode trace puts the tail (norm_out+silu+CausalConv3d C->3) at
71 ms/call = 0.43 ms/slot; its 27 N=8 tap matmuls run the MXU at 6% lane
utilization. The tap-packed variant (decoder_tail._kernel_tap_pack) runs
3 N=72 matmuls + a 9-way lane-group combine ('vpu' shifted adds or 'mm'
one-hot matmuls). This probe traces baseline / vpu / mm / vpu+silu_fast
in ONE jitted program at [1, N, 256, 256, 128] bf16.

  tools/tpu_run.sh probe_tail_pack 2400 -- python tools/probe_tail_pack.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402
from vidtok_tpu.ops.pallas.decoder_tail import decoder_tail_rgb


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.RandomState(0)
    C = 128
    x = jnp.asarray(rng.randn(1, n, 256, 256, C).astype(np.float32) * 0.3,
                    jnp.bfloat16)
    norm = {"scale": jnp.asarray(rng.randn(C) * 0.1 + 1, jnp.float32),
            "bias": jnp.asarray(rng.randn(C) * 0.1, jnp.float32)}
    conv = {"kernel": jnp.asarray(rng.randn(3, 3, 3, C, 3) * 0.05,
                                  jnp.float32),
            "bias": jnp.asarray(rng.randn(3) * 0.1, jnp.float32)}

    @jax.jit
    def program(x):
        acc = jnp.float32(0)
        for kw in (dict(tap_pack=False),
                   dict(tap_pack=True, stage2="vpu"),
                   dict(tap_pack=True, stage2="mm"),
                   dict(tap_pack=True, stage2="vpu", silu_fast=True)):
            y = decoder_tail_rgb(x + acc.astype(x.dtype) * 0, norm, conv,
                                 "replicate", **kw)
            acc += jnp.sum(y.astype(jnp.float32))
        return acc

    print(f"backend: {jax.default_backend()} | N = {n} | "
          "order: baseline, pack-vpu, pack-mm, pack-vpu-silufast", flush=True)
    capture(lambda: float(program(x)), "/tmp/vidtok_prof_tail")
    parse("/tmp/vidtok_prof_tail")


if __name__ == "__main__":
    main()
