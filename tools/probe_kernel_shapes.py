"""Standalone Pallas-kernel compile probe at flagship stage shapes.

The fused flagship graph fails server-side (HTTP 500 from the relay's
tpu_compile_helper) at some (B, T) serving shapes but not others
(T=17/81 pass, T=33/65/97 fail).  Whole-model compiles are a slow bisect
loop; this probes each kernel ALONE on the TPU at the exact per-stage
shapes the flagship (kl_causal_488_16chn: ch=128, ch_mult [1,2,4,4],
tempo_ds [2,1] / tempo_us [1,2]) produces for a given B,T — isolating
which kernel+shape kills the compile helper.

  python tools/probe_kernel_shapes.py [B:T ...]     default 2:33
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

DT = jnp.bfloat16


def stage_shapes(b, t_in):
    """(kernel, shape-tuple) list for the flagship at B x 3 x T x 256 x 256."""
    tp = t_in + 3          # computed frame slots through the causal pad
    tl = tp // 4           # latent frames
    shapes = []
    # fused_temporal_resblock: every level's temporal resblock, enc + dec
    for t, hw, c in [(tp, 256, 128), (tp, 128, 256), (tp // 2, 64, 512),
                     (tl, 32, 512),                      # encoder
                     (tl, 32, 512), (tl, 64, 512),       # decoder up3/up2
                     (tp // 2, 128, 256), (tp, 256, 128)]:
        shapes.append(("temporal", (b, t, hw, hw, c)))
    # fused_spatial_resblock_v2 on the folded N = B*t axis
    for t, hw, cin, c in [(tp, 256, 128, 128), (tp, 128, 128, 256),
                          (tp, 128, 256, 256), (tp // 2, 64, 256, 512),
                          (tl, 32, 512, 512),            # encoder-ish
                          (tl, 64, 512, 512), (tp // 2, 128, 512, 256),
                          (tp, 256, 256, 128)]:          # decoder
        shapes.append(("spatial", (b * t, hw, hw, cin, c)))
    # parity_up2x_fused (TimeUpsampleRes2x nearest): level2 and level1
    shapes.append(("parity_up", (b, tl, 128, 128, 512)))
    shapes.append(("parity_up", (b, tp // 2, 256, 256, 256)))
    # subpixel_interleave (SpatialUpsample): levels 3, 2, 1
    for t, hw, c in [(tl, 32, 512), (tl, 64, 512), (tp // 2, 128, 256)]:
        shapes.append(("subpixel", (b * t, hw, hw, c)))
    # decoder_tail_rgb
    shapes.append(("tail", (b, tp, 256, 256, 128)))
    return shapes


def run_one(kind, shp):
    # device-side generation: pushing GB-scale host arrays through the
    # axon relay dominates otherwise
    seed = [0]

    def arr(*s):
        seed[0] += 1
        return (jax.random.normal(jax.random.PRNGKey(seed[0]), s, jnp.float32)
                * 0.05).astype(DT)

    if kind == "temporal":
        from vidtok_tpu.ops.pallas.fused_temporal import fused_temporal_resblock
        b, t, h, w, c = shp
        x = arr(b, t, h, w, c)
        p = {"norm1": {"scale": arr(c), "bias": arr(c)},
             "conv1": {"kernel": arr(3, 1, 1, c, c), "bias": arr(c)},
             "norm2": {"scale": arr(c), "bias": arr(c)},
             "conv2": {"kernel": arr(3, 1, 1, c, c), "bias": arr(c)}}
        fn = jax.jit(lambda x, p: fused_temporal_resblock(
            x, p, interpret=False))
        out = fn(x, p)
    elif kind == "spatial":
        from vidtok_tpu.ops.pallas.fused_spatial_v2 import (
            fused_spatial_resblock_v2)
        n, h, w, cin, c = shp
        x = arr(n, h, w, cin)
        p = {"norm1": {"scale": arr(cin), "bias": arr(cin)},
             "conv1": {"kernel": arr(1, 3, 3, cin, c), "bias": arr(c)},
             "norm2": {"scale": arr(c), "bias": arr(c)},
             "conv2": {"kernel": arr(1, 3, 3, c, c), "bias": arr(c)}}
        if cin != c:
            p["nin_shortcut"] = {"kernel": arr(1, 1, 1, cin, c),
                                 "bias": arr(c)}
        fn = jax.jit(lambda x, p: fused_spatial_resblock_v2(
            x, p, interpret=False))
        out = fn(x, p)
    elif kind == "parity_up":
        from vidtok_tpu.ops.pallas.parity_upsample_fused import (
            parity_up2x_fused)
        b, t, h, w, c = shp
        s = arr(b, t, h, w, c)
        k = arr(3, 3, 3, c, c)
        bias = arr(c)
        fn = jax.jit(lambda s, k, bias: parity_up2x_fused(
            s, k, bias, 0.5, "replicate", interpret=False))
        out = fn(s, k, bias)
    elif kind == "subpixel":
        from vidtok_tpu.ops.pallas.subpixel_epilogue import subpixel_interleave
        n, h, w, c = shp
        ys = [arr(n, h, w, c) for _ in range(4)]
        bias = arr(c)
        fn = jax.jit(lambda a, b_, c_, d, e: subpixel_interleave(
            a, b_, c_, d, e, interpret=False))
        out = fn(*ys, bias)
    elif kind == "tail":
        from vidtok_tpu.ops.pallas.decoder_tail import decoder_tail_rgb
        b, t, h, w, c = shp
        x = arr(b, t, h, w, c)
        npar = {"scale": arr(c), "bias": arr(c)}
        cpar = {"kernel": arr(3, 3, 3, c, 3), "bias": arr(3)}
        fn = jax.jit(lambda x: decoder_tail_rgb(
            x, npar, cpar, "replicate", interpret=False))
        out = fn(x)
    else:
        raise ValueError(kind)
    if out is None:
        return "SKIP (wrapper returned None)"
    float(jnp.sum(out.astype(jnp.float32)))
    return "ok"


def main():
    combos = [tuple(int(v) for v in a.split(":")) for a in sys.argv[1:]] \
        or [(2, 33)]
    for b, t_in in combos:
        print(f"=== B={b} T={t_in} ===", flush=True)
        for kind, shp in stage_shapes(b, t_in):
            try:
                r = run_one(kind, shp)
            except Exception as e:
                r = f"FAIL {type(e).__name__}: {str(e)[:160]}"
            print(f"{kind:10s} {str(shp):28s} {r}", flush=True)


if __name__ == "__main__":
    main()
