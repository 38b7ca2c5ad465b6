"""Device-time A/B of the fused kernels' W-shift strategy (spatial
resblock + parity upsample + decoder tail).

Hypothesis (round-4, from the T=161 trace): the kernel's padded-slice tap
operands (``hp[dr:dr+r, dw:dw+w]``, sublane offsets 1/2) force Mosaic vreg
relayouts on 6 of the 9 tap matmuls per conv, capping the flagship spatial
stages at 46-60% MXU. The ``pre_shift`` variant materializes the two
W-shifted copies once per conv and feeds every matmul an aligned
leading-dim slice.

Runs both variants inside ONE jitted program (chained so XLA cannot elide
either) at the flagship's three hottest spatial-stage shapes, captures a
trace, prints device ms per pallas call. Wall timing over the axon relay
is dispatch-dominated — traces are the only per-op truth (BENCH_NOTES).

  python tools/probe_spatial_shift.py [N]   # frames folded into batch
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402
from vidtok_tpu.ops.pallas.decoder_tail import decoder_tail_rgb
from vidtok_tpu.ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2
from vidtok_tpu.ops.pallas.parity_upsample_fused import parity_up2x_fused

# flagship spatial stages by decode-trace heat (T=161):
#   up_0 blocks  256p 128->128 (70 ms) and block_0 256->128 (107 ms)
#   up_1 blocks  128p 256->256 (23-38 ms); encoder down_0/down_1 mirror
STAGES = [
    ("s256_c128", 256, 128, 128),
    ("s256_nin256", 256, 256, 128),
    ("s128_c256", 128, 256, 256),
]


def make_params(rng, cin, c):
    p = {
        "norm1": {"scale": jnp.asarray(rng.randn(cin) * 0.1 + 1,
                                       jnp.float32),
                  "bias": jnp.asarray(rng.randn(cin) * 0.1, jnp.float32)},
        "conv1": {"kernel": jnp.asarray(rng.randn(1, 3, 3, cin, c) * 0.02,
                                        jnp.float32),
                  "bias": jnp.asarray(rng.randn(c) * 0.01, jnp.float32)},
        "norm2": {"scale": jnp.asarray(rng.randn(c) * 0.1 + 1, jnp.float32),
                  "bias": jnp.asarray(rng.randn(c) * 0.1, jnp.float32)},
        "conv2": {"kernel": jnp.asarray(rng.randn(1, 3, 3, c, c) * 0.02,
                                        jnp.float32),
                  "bias": jnp.asarray(rng.randn(c) * 0.01, jnp.float32)},
    }
    if cin != c:
        p["nin_shortcut"] = {
            "kernel": jnp.asarray(rng.randn(1, 1, 1, cin, c) * 0.1,
                                  jnp.float32),
            "bias": jnp.asarray(rng.randn(c) * 0.01, jnp.float32)}
    return p


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    rng = np.random.RandomState(0)
    cases = []
    for name, hw, cin, c in STAGES:
        x = jnp.asarray(rng.randn(n, hw, hw, cin).astype(np.float32) * 0.3,
                        jnp.bfloat16)
        cases.append((name, x, make_params(rng, cin, c)))

    # parity upsample at decoder level-1 shape (up_temporal_1_upsample:
    # 99 ms in the T=161 trace) and decoder tail at the flagship output
    tpar = max(2, n // 4)
    s_par = jnp.asarray(rng.randn(1, tpar, 128, 128, 256)
                        .astype(np.float32) * 0.3, jnp.bfloat16)
    k_par = jnp.asarray(rng.randn(3, 3, 3, 256, 256) * 0.02, jnp.float32)
    b_par = jnp.asarray(rng.randn(256) * 0.01, jnp.float32)
    x_tail = jnp.asarray(rng.randn(1, n, 256, 256, 128)
                         .astype(np.float32) * 0.3, jnp.bfloat16)
    n_tail = {"scale": jnp.asarray(rng.randn(128) * 0.1 + 1, jnp.float32),
              "bias": jnp.asarray(rng.randn(128) * 0.1, jnp.float32)}
    c_tail = {"kernel": jnp.asarray(rng.randn(3, 3, 3, 128, 3) * 0.02,
                                    jnp.float32),
              "bias": jnp.asarray(rng.randn(3) * 0.01, jnp.float32)}

    @jax.jit
    def program(xs, ps, s_par, k_par, b_par, x_tail, n_tail, c_tail):
        acc = jnp.float32(0.0)
        for (x, p) in zip(xs, ps):
            for pre_shift in (False, True):
                xb = x + acc.astype(x.dtype) * 1e-30      # serialize
                o = fused_spatial_resblock_v2(x=xb, params=p,
                                              pre_shift=pre_shift)
                assert o is not None, "kernel gate rejected probe shape"
                acc += jnp.sum(o.astype(jnp.float32))
        for pre_shift in (False, True):
            sb = s_par + acc.astype(s_par.dtype) * 1e-30
            o = parity_up2x_fused(sb, k_par, b_par, 0.3, "replicate",
                                  pre_shift=pre_shift)
            assert o is not None
            acc += jnp.sum(o.astype(jnp.float32))
            tb = x_tail + acc.astype(x_tail.dtype) * 1e-30
            o = decoder_tail_rgb(tb, n_tail, c_tail, "replicate",
                                 pre_shift=pre_shift)
            assert o is not None
            acc += jnp.sum(o.astype(jnp.float32))
        return acc

    xs = tuple(c[1] for c in cases)
    ps = tuple(c[2] for c in cases)
    program = functools.partial(program, s_par=s_par, k_par=k_par,
                                b_par=b_par, x_tail=x_tail, n_tail=n_tail,
                                c_tail=c_tail)
    print("backend:", jax.default_backend(), "| N =", n,
          "| order per stage: padded-slice, pre-shift")
    trace_dir = "/tmp/vidtok_prof_spatial_shift"
    capture(lambda: program(xs, ps), trace_dir)
    parse(trace_dir)


if __name__ == "__main__":
    main()
