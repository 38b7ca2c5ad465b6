"""Probe: can the fused kernels' silu run in bf16 lanes via tanh?

Mosaic's bf16 logistic lowering trips a verifier bug (f32->bf16
vector.broadcast; see CLAUDE.md), so every fused kernel computes
silu in f32 lanes — ~2x the VPU lane cost. sigmoid(x) =
0.5*(1+tanh(x/2)) avoids the logistic path entirely; if bf16 tanh
lowers cleanly, the temporal kernel's VPU epilogue halves
(BENCH_NOTES round-2 lever #2: ~1 ms x 7 kernel instances per clip).

Compiles three tiny kernels on the TPU and microbenches a
temporal-resblock-sized elementwise pass:
  f32-logistic (shipped), bf16-tanh, bf16-logistic (expected verifier
  failure — recorded as evidence the bug persists).

  python tools/probe_silu_bf16.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(mode):
    def kern(x_ref, o_ref):
        x = x_ref[...]
        if mode == "f32_logistic":
            xf = x.astype(jnp.float32)
            y = xf * jax.lax.logistic(xf)
            o_ref[...] = y.astype(x.dtype)
        elif mode == "bf16_tanh":
            y = x * (0.5 * (jnp.tanh(x * 0.5) + 1.0).astype(x.dtype))
            o_ref[...] = y
        elif mode == "bf16_logistic":
            o_ref[...] = x * jax.lax.logistic(x)
        else:
            raise ValueError(mode)

    return kern


def run(mode, shape=(64, 512, 512), iters=30):
    x = (jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
         .astype(jnp.bfloat16))
    fn = pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.bfloat16),
        grid=(shape[0],),
        in_specs=[pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1,) + shape[1:], lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(lambda x: jnp.sum(fn(x).astype(jnp.float32)))
    try:
        float(jfn(x))
    except Exception as e:
        print(f"{mode:14s} FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)
        return
    float(jfn(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = jfn(x)
    float(v)
    dt = (time.perf_counter() - t0) / iters
    gb = 2 * x.size * 2 / 1e9
    print(f"{mode:14s} {dt*1e3:7.3f} ms  {gb/dt:6.1f} GB/s", flush=True)


def main():
    for mode in ("f32_logistic", "bf16_tanh", "bf16_logistic"):
        run(mode)


if __name__ == "__main__":
    main()
