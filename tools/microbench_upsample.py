"""Microbench of TimeUpsampleRes2x implementations at the flagship's
level-1 shapes ([1,10,256,256,256] bf16 -> [1,20,256,256,256]).

Variants:
  naive   — materialize nearest-2x, causal (3,3,3) conv (decomposed), blend
  packed  — shipped parity path: concat(s_prev,s) -> one [3,3,2C,2C] conv
  twoconv — parity without the concat: two C->2C convs, output-shifted add

Small isolated graphs: compiles in minutes, informs the round-2 default
without touching the shipped decode HLO.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import vidtok_tpu.modules.blocks as B
from vidtok_tpu.modules.conv import _conv2d_frames, conv3d


def timeit(fn, n=10):
    float(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def naive(s, k, bias, alpha):
    x = B.temporal_nearest_up2x(s)
    front = jnp.zeros_like(x[:, :2])
    xp = jnp.concatenate([front, x], axis=1)
    y = conv3d(xp, k, bias, (1, 1, 1), [(0, 0), (1, 1), (1, 1)])
    return alpha * x + (1 - alpha) * y


def twoconv(s, k, bias, alpha):
    b_, t, h, w, c = s.shape
    dt = s.dtype
    k = k.astype(dt)
    k_prev = jnp.concatenate([k[0] + k[1], k[0]], axis=-1)  # [3,3,C,2C]
    k_cur = jnp.concatenate([k[2], k[1] + k[2]], axis=-1)
    y_cur = _conv2d_frames(s, k_cur, (1, 1), [(1, 1), (1, 1)])
    y_prev = _conv2d_frames(s, k_prev, (1, 1), [(1, 1), (1, 1)])
    # result[a] needs k_prev * s[a-1]: shift y_prev right by one frame
    front = jnp.zeros_like(y_prev[:, :1])
    y_prev = jnp.concatenate([front, y_prev[:, :-1]], axis=1)
    yc = (y_cur + y_prev).reshape(b_, t, h, w, 2, c) + bias
    y = alpha * s[:, :, :, :, None, :] + (1 - alpha) * yc.astype(dt)
    return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b_, 2 * t, h, w, c)


def main():
    rng = np.random.RandomState(0)
    c = 256
    s = jnp.asarray(rng.randn(1, 10, 256, 256, c), jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, c, c) * 0.02, jnp.bfloat16)
    bias = jnp.asarray(rng.randn(c) * 0.01, jnp.float32)
    alpha = jnp.bfloat16(0.88)

    fns = {
        "naive": jax.jit(lambda s: jnp.sum(naive(s, k, bias, alpha))),
        "packed": jax.jit(lambda s: jnp.sum(
            B._parity_up2x_conv_blend(s, k, bias, alpha, "zero"))),
        "twoconv": jax.jit(lambda s: jnp.sum(twoconv(s, k, bias, alpha))),
    }
    # exactness first (cheap at tiny shape, fp32)
    st = jnp.asarray(rng.randn(1, 4, 8, 8, 16), jnp.float32)
    kt = jnp.asarray(rng.randn(3, 3, 3, 16, 16) * 0.1, jnp.float32)
    bt = jnp.asarray(rng.randn(16) * 0.1, jnp.float32)
    a32 = jnp.float32(0.88)
    ref = naive(st, kt, bt, a32)
    for name, f in (("packed", B._parity_up2x_conv_blend),
                    ("twoconv", twoconv)):
        got = (f(st, kt, bt, a32, "zero") if name == "packed"
               else f(st, kt, bt, a32))
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"{name} exactness vs naive: {err:.2e}")
        # TPU fp32 convs accumulate through bf16 passes by default ->
        # ~1e-3; exactness proper is asserted on CPU in test_fast_paths
        tol = 1e-5 if jax.default_backend() == "cpu" else 1e-2
        assert err < tol, name

    for name in sys.argv[1:] or ["naive", "packed", "twoconv"]:
        ms = timeit(lambda f=fns[name]: f(s))
        print(f"{name:8s}: {ms:7.2f} ms")


if __name__ == "__main__":
    main()
