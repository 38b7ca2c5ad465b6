"""conv_in (3->128 channels) XLA variants, trace-profiled in one program.

The encoder's conv_in costs 3.6 ms/clip at B=4 against a ~1.7 ms
write-bandwidth floor. Probe whether input-channel padding or the direct
3D form changes XLA's codepath.

  python tools/probe_convin.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from profile_breakdown import capture, parse  # noqa: E402


def conv2d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    rng = np.random.RandomState(0)
    N, H, W = 68, 256, 256
    x3 = jnp.asarray(rng.randn(N, H, W, 3) * 0.1, jnp.bfloat16)
    k3 = jnp.asarray(rng.randn(3, 3, 3, 128) * 0.1, jnp.bfloat16)
    x8 = jnp.pad(x3, ((0, 0),) * 3 + ((0, 5),))
    k8 = jnp.pad(k3, ((0, 0),) * 2 + ((0, 5), (0, 0)))
    x32 = jnp.pad(x3, ((0, 0),) * 3 + ((0, 29),))
    k32 = jnp.pad(k3, ((0, 0),) * 2 + ((0, 29), (0, 0)))

    @jax.jit
    def program(x3, k3, x8, k8, x32, k32):
        acc = jnp.float32(0.0)
        y = conv2d(x3, k3)                   # v0: raw 3-channel input
        acc += jnp.sum(y.astype(jnp.float32))
        y = conv2d(x8 + acc.astype(jnp.bfloat16) * 0, k8)    # v1: pad to 8
        acc += jnp.sum(y.astype(jnp.float32))
        y = conv2d(x32 + acc.astype(jnp.bfloat16) * 0, k32)  # v2: pad to 32
        acc += jnp.sum(y.astype(jnp.float32))
        return acc

    capture(lambda: program(x3, k3, x8, k8, x32, k32), "/tmp/vidtok_prof_ci")
    parse("/tmp/vidtok_prof_ci")


if __name__ == "__main__":
    main()
