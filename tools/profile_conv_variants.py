"""Trace-profiled experiments on the two hottest decoder conv patterns.

A) Parity temporal-upsample pair (modules/blocks.py twoconv form, C=256):
   two C->2C convs over the same input vs ONE C->4C conv (halves input
   reads, doubles N for MXU pipelining).
B) Decomposed causal 3x3x3 at level-0 shapes (C=128): three time-shifted
   2D convs + adds (what XLA sees today) vs tap-concat into channels ->
   one conv with K=3C (kills the partial-sum HBM passes, triples K).

Wall timing through the axon relay is dispatch-bound, so everything runs
inside one jitted program and durations come from the trace
(tools/profile_breakdown.parse).

  python tools/profile_conv_variants.py
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
    """x: [N,H,W,Cin], k: [kh,kw,Cin,Cout], SAME padding."""
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def main():
    rng = np.random.RandomState(0)
    dt = jnp.bfloat16

    # --- A: parity upsample shapes (level 1: T'=10, 256x256, C=256)
    Ta, Ha, Ca = 10, 256, 256
    sa = jnp.asarray(rng.randn(Ta, Ha, Ha, Ca) * 0.1, dt)
    k_cur = jnp.asarray(rng.randn(3, 3, Ca, 2 * Ca) * 0.02, dt)
    k_prev = jnp.asarray(rng.randn(3, 3, Ca, 2 * Ca) * 0.02, dt)
    k_four = jnp.concatenate([k_cur, k_prev], axis=-1)  # [3,3,C,4C]

    # --- B: level-0 temporal-tap shapes (T=17, 256x256, C=128)
    Tb, Hb, Cb = 17, 256, 128
    xb = jnp.asarray(rng.randn(Tb, Hb, Hb, Cb) * 0.1, dt)
    kt = jnp.asarray(rng.randn(3, 3, 3, Cb, Cb) * 0.02, dt)  # [kt,kh,kw,I,O]

    @jax.jit
    def program(sa, k_cur, k_prev, k_four, xb, kt):
        acc = jnp.float32(0.0)

        # A1: shipped twoconv pair
        y1 = conv2d(sa, k_cur)
        y2 = conv2d(sa, k_prev)
        acc += jnp.sum(y1.astype(jnp.float32)) + jnp.sum(y2.astype(jnp.float32))

        # A2: single 4C-wide conv
        sb = sa + (acc * 1e-30).astype(dt)
        y = conv2d(sb, k_four)
        acc += jnp.sum(y.astype(jnp.float32))

        # B1: decomposed 3-tap 2D convs + adds (shipped conv path)
        xc = xb + (acc * 1e-30).astype(dt)
        pads = jnp.concatenate([jnp.zeros((2,) + xc.shape[1:], dt), xc], 0)
        z = (conv2d(pads[0:Tb], kt[0]) + conv2d(pads[1:Tb + 1], kt[1])
             + conv2d(pads[2:Tb + 2], kt[2]))
        acc += jnp.sum(z.astype(jnp.float32))

        # B2: tap-concat into channels -> one conv, K=3C
        xc = xb + (acc * 1e-30).astype(dt)
        pads = jnp.concatenate([jnp.zeros((2,) + xc.shape[1:], dt), xc], 0)
        big = jnp.concatenate([pads[0:Tb], pads[1:Tb + 1], pads[2:Tb + 2]],
                              axis=-1)  # [T,H,W,3C]
        k_big = jnp.concatenate([kt[0], kt[1], kt[2]], axis=2)  # [3,3,3C,C]
        z = conv2d(big, k_big)
        acc += jnp.sum(z.astype(jnp.float32))

        return acc

    capture(lambda: program(sa, k_cur, k_prev, k_four, xb, kt),
            "/tmp/vidtok_prof_convvar")
    rows, _ = parse("/tmp/vidtok_prof_convvar")

    fl_a = 2 * Ta * Ha * Ha * 9 * Ca * 2 * Ca  # per twoconv conv
    fl_b = 2 * Tb * Hb * Hb * 9 * Cb * Cb      # per tap conv
    print(f"\nA conv FLOP each {fl_a/1e12:.2f}T (x2 shipped / x2 in one 4C)"
          f"; B tap FLOP {fl_b/1e12:.2f}T (x3)")


if __name__ == "__main__":
    main()
