"""Device-time sweep of the parity upsample kernel's tiling knobs.

trace_decode_t201: up_temporal_1_upsample (256p, C=256) is the single
heaviest decode op at 122.5 ms and up_temporal_2_upsample (128p, C=512)
adds 61.2 — ~22% of decode — yet parity_up2x_fused still runs its
original row_tile=4 / chunk_c=256 defaults, never swept. The row halo
(top/bot rows re-read per block) is 2/r of input traffic and the grid
shrinks with r, so bigger rows should win under the VMEM-64 serving
budget; at C=512 a cc=512 chunk halves the re-reads of the conv input
(g: 2 -> 1) at the cost of a 13.5 MB weight block.

  tools/tpu_run.sh probe_uptile 2400 -- python tools/probe_uptile.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402
from vidtok_tpu.ops.pallas.parity_upsample_fused import parity_up2x_fused

# (name, t, hw, c) — serving decode shapes at 1/6 the protocol t (cost
# is linear in t; tile behavior is per-row, unchanged)
STAGES = [
    ("lvl1_c256_256p", 16, 256, 256),
    ("lvl2_c512_128p", 16, 128, 512),
]
# (row_tile, chunk_c) variants per stage
VARIANTS = {
    "lvl1_c256_256p": [(4, 256), (8, 256), (16, 256)],
    "lvl2_c512_128p": [(4, 256), (8, 256), (16, 256), (4, 512), (8, 512)],
}


def up_params(rng, c):
    k = jnp.asarray(rng.randn(3, 3, 3, c, c).astype(np.float32)
                    * (0.5 / (3 * c) ** 0.5))
    bias = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    return k, bias, 0.7


def main():
    rng = np.random.RandomState(0)
    names, cases = [], []
    for name, t, hw, c in STAGES:
        s = jnp.asarray(rng.randn(1, t, hw, hw, c).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        names.append(name)
        cases.append((s, up_params(rng, c)))

    order = [(n, VARIANTS[n]) for n in names]

    @jax.jit
    def program(sp):
        acc = jnp.float32(0.0)
        for name, (s, (k, bias, alpha)) in zip(names, sp):
            for (r, cc) in VARIANTS[name]:
                sb = s + acc.astype(s.dtype) * 1e-30
                o = parity_up2x_fused(sb, k, bias, alpha, "replicate",
                                      row_tile=r, chunk_c=cc)
                assert o is not None, (name, r, cc)
                acc += jnp.sum(o.astype(jnp.float32))
        return acc

    print("backend:", jax.default_backend(), "| variant order:", order)
    capture(lambda: float(program(tuple(cases))), "/tmp/vidtok_prof_uptile")
    parse("/tmp/vidtok_prof_uptile")


if __name__ == "__main__":
    main()
