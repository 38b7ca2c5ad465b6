"""Is int8 conv actually ~2x bf16 on this TPU through XLA? Trace-profiled
probe at the two hottest decoder conv shapes, including the quantize /
dequantize elementwise cost around the conv.

  python tools/profile_int8.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402


def conv2d(x, k, acc_dtype):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype)


def main():
    rng = np.random.RandomState(0)

    shapes = [
        ("lvl0", 17, 256, 128, 128),   # up_0 spatial conv
        ("ups1", 10, 256, 256, 512),   # parity upsample conv (C->2C)
    ]
    args = []
    for name, T, H, Cin, Cout in shapes:
        x = jnp.asarray(rng.randn(T, H, H, Cin) * 0.1, jnp.bfloat16)
        k = jnp.asarray(rng.randn(3, 3, Cin, Cout) * 0.02, jnp.bfloat16)
        kq = jnp.clip(jnp.round(k.astype(jnp.float32) / 0.001), -127,
                      127).astype(jnp.int8)
        args.append((x, k, kq))

    @jax.jit
    def program(args):
        acc = jnp.float32(0.0)
        for x, k, kq in args:
            # bf16 baseline
            y = conv2d(x, k, jnp.float32)
            acc += jnp.sum(y)
            # int8: dynamic-scale quantize + int8 conv + dequant
            xb = x + (acc * 1e-30).astype(x.dtype)
            s = jnp.max(jnp.abs(xb.astype(jnp.float32))) / 127.0
            xq = jnp.clip(jnp.round(xb.astype(jnp.float32) / s),
                          -127, 127).astype(jnp.int8)
            yq = conv2d(xq, kq, jnp.int32)
            acc += jnp.sum(yq.astype(jnp.float32) * (s * 0.001))
            # int8 with pre-quantized input (static scale; no dyn pass)
            xq2 = jnp.clip(xb.astype(jnp.float32) * 8.0, -127,
                           127).astype(jnp.int8)
            yq2 = conv2d(xq2, kq, jnp.int32)
            acc += jnp.sum(yq2.astype(jnp.float32))
        return acc

    capture(lambda: program(args), "/tmp/vidtok_prof_int8")
    parse("/tmp/vidtok_prof_int8")
    for name, T, H, Cin, Cout in shapes:
        fl = 2 * T * H * H * 9 * Cin * Cout
        print(f"{name}: {fl/1e12:.2f} TFLOP per conv")


if __name__ == "__main__":
    main()
