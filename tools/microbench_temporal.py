"""Microbench variants of the fused temporal resblock kernel on the TPU.

The shipped kernel (ops/pallas/fused_temporal.py) runs its 6 per-tile
matmuls as 3-tap accumulations ([N,C]x[C,C] + add), measured at only
~18-36% MXU. Variants:

  v0  shipped kernel (3-tap accumulate)
  v1  fat matmul: concatenate the 3 shifted views -> one [N,3C]x[3C,C]
  v2  fat matmul + tile_s 256
  xla unfused module-path ops for reference

Run: python tools/microbench_temporal.py [C T S]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtok_tpu.ops.pallas.fused_temporal import (_ln_silu, _pad_front,
                                                  fused_temporal_resblock)


def _tconv3_fat(a_pad, w_fat, t_out, ts):
    """a_pad: [t_out+2, ts, Cin]; w_fat: [3*Cin, Cout] (tap-major rows)."""
    cin = a_pad.shape[-1]
    a = jnp.concatenate(
        [a_pad[j:j + t_out].reshape(t_out * ts, cin) for j in range(3)],
        axis=-1)
    return jnp.dot(a, w_fat,
                   preferred_element_type=jnp.float32).reshape(t_out, ts, -1)


def _kernel_fat(x_ref, ln1_s, ln1_b, w1, b1, ln2_s, ln2_b, w2, b2,
                out_ref, *, t, tile_s, replicate):
    x = x_ref[0]
    dtype = x.dtype
    a1 = _ln_silu(x, ln1_s[:], ln1_b[:]).astype(dtype)
    h = _tconv3_fat(_pad_front(a1, 2, replicate), w1[:], t, tile_s) + b1[:]
    a2 = _ln_silu(h, ln2_s[:], ln2_b[:]).astype(dtype)
    y = _tconv3_fat(_pad_front(a2, 2, replicate), w2[:], t, tile_s) + b2[:]
    out_ref[0] = (x.astype(jnp.float32) + y).astype(dtype)


def fused_fat(x, params, tile_s=128):
    b, t, h, w, c = x.shape
    s = h * w
    xf = x.reshape(b, t, s, c)
    dtype = x.dtype
    k1 = params["conv1"]["kernel"].reshape(3, c, c).astype(dtype).reshape(3 * c, c)
    k2 = params["conv2"]["kernel"].reshape(3, c, c).astype(dtype).reshape(3 * c, c)
    kern = functools.partial(_kernel_fat, t=t, tile_s=tile_s, replicate=False)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t, s, c), dtype),
        grid=(b, s // tile_s),
        in_specs=[pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)] + [vspec] * 8,
        out_specs=pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(xf,
      params["norm1"]["scale"].astype(jnp.float32),
      params["norm1"]["bias"].astype(jnp.float32),
      k1, params["conv1"]["bias"].astype(jnp.float32),
      params["norm2"]["scale"].astype(jnp.float32),
      params["norm2"]["bias"].astype(jnp.float32),
      k2, params["conv2"]["bias"].astype(jnp.float32))
    return out.reshape(b, t, h, w, c)


def _kernel_diag(x_ref, ln1_s, ln1_b, w1, b1, ln2_s, ln2_b, w2, b2,
                 out_ref, *, t, tile_s, mode):
    from vidtok_tpu.ops.pallas.fused_temporal import _tconv3

    x = x_ref[0]
    dtype = x.dtype
    if mode == "copy":
        out_ref[0] = x
        return
    if mode == "mm":
        # matmuls only, no LN/silu/pad
        h = _tconv3(_pad_front(x, 2, False), w1[:], t, tile_s).astype(dtype)
        y = _tconv3(_pad_front(h, 2, False), w2[:], t, tile_s)
        out_ref[0] = (x.astype(jnp.float32) + y).astype(dtype)
        return
    # ln: both LN+silu passes, no matmuls
    a1 = _ln_silu(x, ln1_s[:], ln1_b[:]).astype(dtype)
    a2 = _ln_silu(a1, ln2_s[:], ln2_b[:]).astype(dtype)
    out_ref[0] = (x.astype(jnp.float32) + a2.astype(jnp.float32)).astype(dtype)


def fused_diag(x, params, tile_s=128, mode="mm"):
    b, t, h, w, c = x.shape
    s = h * w
    xf = x.reshape(b, t, s, c)
    dtype = x.dtype
    k1 = params["conv1"]["kernel"].reshape(3, c, c).astype(dtype)
    k2 = params["conv2"]["kernel"].reshape(3, c, c).astype(dtype)
    kern = functools.partial(_kernel_diag, t=t, tile_s=tile_s, mode=mode)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t, s, c), dtype),
        grid=(b, s // tile_s),
        in_specs=[pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM)] + [vspec] * 8,
        out_specs=pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(xf,
      params["norm1"]["scale"].astype(jnp.float32),
      params["norm1"]["bias"].astype(jnp.float32),
      k1, params["conv1"]["bias"].astype(jnp.float32),
      params["norm2"]["scale"].astype(jnp.float32),
      params["norm2"]["bias"].astype(jnp.float32),
      k2, params["conv2"]["bias"].astype(jnp.float32))
    return out.reshape(b, t, h, w, c)


def copy_min(x, tile_s=128, tile_t=None):
    """Pure block copy through VMEM, x operand only — DMA floor probe."""
    b, t, h, w, c = x.shape
    s = h * w
    xf = x.reshape(b, t, s, c)
    tt = tile_t or t

    def kern(x_ref, out_ref):
        out_ref[...] = x_ref[...]

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t, s, c), x.dtype),
        grid=(b, t // tt, s // tile_s),
        in_specs=[pl.BlockSpec((1, tt, tile_s, c),
                               lambda i, k, j: (i, k, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, tt, tile_s, c),
                               lambda i, k, j: (i, k, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() == "cpu",
    )(xf)
    return out.reshape(b, t, h, w, c)


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

    flops = 2 * 2 * 3 * T * S * S * C * C

    def timeit(name, fn, *args, **kw):
        f = jax.jit(functools.partial(fn, **kw))
        out = f(*args)
        float(jnp.sum(out.astype(jnp.float32)))  # sync (axon relay)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:14s} {dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s")
        return out

    gbs = 2 * x.size * x.dtype.itemsize / 1e9

    def timebw(name, fn, *args, **kw):
        f = jax.jit(functools.partial(fn, **kw))
        out = f(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(*args)
        float(jnp.sum(out.astype(jnp.float32)))
        dt = (time.perf_counter() - t0) / n
        print(f"{name:14s} {dt*1e3:7.2f} ms  {gbs/dt:6.0f} GB/s")

    timebw("copy min128", copy_min, x)
    timebw("copy min256", copy_min, x, tile_s=256)
    timebw("copy t1 s512", copy_min, x, tile_s=512, tile_t=1)
    timebw("copy t1 s4096", copy_min, x, tile_s=4096, tile_t=1)
    timebw("copy t3 s1024", copy_min, x, tile_s=1024, tile_t=3)
    timebw("xla roundtrip", lambda a: a * 1.000001, x)
    o0 = timeit("v0 shipped", fused_temporal_resblock, x, params)
    o1 = timeit("v1 fat ts64", fused_fat, x, params, tile_s=64)
    timeit("v2 mm-only", fused_diag, x, params, mode="mm")
    timeit("v3 ln-only", fused_diag, x, params, mode="ln")
    timeit("v4 copy-only", fused_diag, x, params, mode="copy")
    np.testing.assert_allclose(np.asarray(o0, np.float32),
                               np.asarray(o1, np.float32), atol=3e-2)
    print("exact: v1 == v0")


if __name__ == "__main__":
    main()
