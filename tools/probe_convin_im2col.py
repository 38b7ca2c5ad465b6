"""conv_in (3->128) at serving scale: decomposed-2D vs im2col variants.

The T=161 encode trace (bench_artifacts/trace_encode_t161.log) puts
conv_in at ~30 ms/call (fusion.8 15.8 + three ~4.7 ms time-tap convs):
the 3-channel input starves the MXU K dim (K=27 per 2D tap at best).
im2col packs all 27 taps x 3 channels into one K=81 matmul (63% K util
after padding to 128) at the cost of materializing the patch tensor
(~1.7 GB bf16 at T=161 full-frame).

Variants, trace-profiled in ONE jitted program (relay-safe):
  v0  decomposed: 3 time-shifted 2D convs on [N,H,W,3] (production path)
  v1  im2col-81: 27 channel-concat'd shifted slices -> [N*H*W,81]@[81,128]
  v2  conv_general_dilated_patches + matmul (XLA's own im2col)

CPU check: python tools/probe_convin_im2col.py check
TPU probe: tools/tpu_run.sh probe_convin 2400 -- \
    python tools/probe_convin_im2col.py [N]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def v0_decomposed(x, k):
    """x: [N,H,W,3] (N = folded time incl. 2-frame causal front pad),
    k: [3,3,3,3,128] DHWIO. Causal: out[t] = sum_dt conv2d(x[t+dt])."""
    n = x.shape[0]
    y = None
    for dt in range(3):
        yj = conv2d(x[dt:n - 2 + dt], k[dt])
        y = yj if y is None else y + yj
    return y


def v1_im2col(x, k):
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = []
    for dt in range(3):
        for di in range(3):
            for dj in range(3):
                cols.append(
                    xp[dt:n - 2 + dt, di:di + h, dj:dj + w, :])
    patches = jnp.concatenate(cols, axis=-1)           # [N-2,H,W,81]
    kf = k.transpose(0, 1, 2, 3, 4).reshape(81, -1)    # [81,128]
    y = jax.lax.dot_general(
        patches.reshape(-1, 81), kf.astype(x.dtype),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return y.reshape(n - 2, h, w, -1).astype(x.dtype)


def v2_patches(x, k):
    n, h, w, c = x.shape
    # spatial patches per frame, then 3 time-shifted adds on the matmul
    pt = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))    # [N,H,W,27] (C-major)
    kf = k.reshape(3, 3, 3, 3, -1)
    y = None
    for dt in range(3):
        # patches channel order: (c, di, dj) per conv_general_dilated_patches
        kd = kf[dt].transpose(2, 0, 1, 3).reshape(27, -1)  # [(c,di,dj),128]
        yj = jax.lax.dot_general(
            pt[dt:n - 2 + dt].reshape(-1, 27), kd.astype(x.dtype),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        y = yj if y is None else y + yj
    return y.reshape(n - 2, h, w, -1).astype(x.dtype)


def s2d_kernel(k_np):
    """Build the 3x3-cell s2d kernel [3, 3, 3, 12, 4*co] from the causal
    conv kernel (numpy, outside jit)."""
    import numpy as np
    co = k_np.shape[-1]
    k2 = np.zeros((3, 3, 3, 12, 4 * co), np.float32)
    for kt in range(3):
        for pi in range(2):
            for pj in range(2):
                for di in range(3):
                    for dj in range(3):
                        ci_, qi = divmod(pi + di + 1, 2)
                        cj_, qj = divmod(pj + dj + 1, 2)
                        k2[kt, ci_, cj_,
                           (qi * 2 + qj) * 3:(qi * 2 + qj) * 3 + 3,
                           (pi * 2 + pj) * co:(pi * 2 + pj) * co + co] += \
                            k_np[kt, di, dj]
    return k2


def v3_s2d(x, k2j, co):
    """space-to-depth: 3x3 conv at 256p Cin=3 == 3x3-cell conv at 128p
    Cin=12 with (phase,co) output channels + depth-to-space. Lifts the
    conv's starved K dim 27 -> 108 without materializing HBM patches."""
    n, h, w, c = x.shape
    h2, w2 = h // 2, w // 2
    # s2d: [N,H,W,3] -> [N,H/2,W/2,12] with channel order (ph_i, ph_j, c)
    xs = x.reshape(n, h2, 2, w2, 2, c).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(n, h2, w2, 12)
    # kernel mapping (see s2d_kernel): out pixel (2i+pi, 2j+pj) taps input
    # (2i+pi+di-1, 2j+pj+dj-1); the 4 output pixels of a cell tap pixels
    # [2i-1 .. 2i+2] — spanning THREE s2d cells — so the 3x3 pixel conv is
    # a VALID 3x3 CELL conv over a (1,1)-cell-padded input.
    xp = jnp.pad(xs, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = None
    for kt in range(3):
        yj = jax.lax.conv_general_dilated(
            xp[kt:n - 2 + kt], k2j[kt].astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yj if y is None else y + yj
    # y: [N-2, h2, w2, (pi,pj,co)] -> depth-to-space
    y = y.reshape(n - 2, h2, w2, 2, 2, co).transpose(0, 1, 3, 2, 4, 5) \
        .reshape(n - 2, h, w, co)
    return y.astype(x.dtype)


def v4_tfold(x, k):
    """Fold the 3 TIME taps into input channels: ONE 2D conv with
    Cin=9 / K=81. The decomposed path's cost is dominated by the f32
    partial-sum adds + converts between its 3 conv calls (trace_encode:
    fusion.8 15.8 ms of conv_in's 30); the concat here is tiny (3x a
    3-channel input) and the single conv lifts K-util 27 -> 81."""
    n = x.shape[0]
    xt = jnp.concatenate([x[dt:n - 2 + dt] for dt in range(3)], axis=-1)
    kf = k.transpose(1, 2, 0, 3, 4).reshape(3, 3, 9, -1)  # [kh,kw,(dt,ci),co]
    return conv2d(xt, kf.astype(x.dtype))


def main():
    check = len(sys.argv) > 1 and sys.argv[1] == "check"
    n = 16 if check else int(sys.argv[1]) if len(sys.argv) > 1 else 166
    h = w = 64 if check else 256
    rng = np.random.RandomState(0)
    dt = jnp.float32 if check else jnp.bfloat16
    x = jnp.asarray(rng.randn(n, h, w, 3) * 0.3, dt)
    k = jnp.asarray(rng.randn(3, 3, 3, 3, 128) * 0.1, dt)

    k2j = jnp.asarray(s2d_kernel(np.asarray(k, np.float32)), dt)

    if check:
        a = v0_decomposed(x, k)
        for name, fn in (("v1", v1_im2col), ("v2", v2_patches),
                         ("v3", lambda x, k: v3_s2d(x, k2j, 128)),
                         ("v4", v4_tfold)):
            d = float(jnp.max(jnp.abs(a - fn(x, k))))
            print(f"{name} max|d|:", d)
            assert d < 1e-4, name
        print("OK")
        return

    from profile_breakdown import capture, parse

    # v1/v2 measured 2.5x SLOWER (probe_convin_im2col.log, round 4) —
    # only the production path and the s2d candidate compile here
    @jax.jit
    def program(x, k, k2j):
        acc = jnp.float32(0)
        y = v0_decomposed(x, k)
        acc += jnp.sum(y.astype(jnp.float32))
        y = v3_s2d(x + acc.astype(dt) * 0, k2j, 128)
        acc += jnp.sum(y.astype(jnp.float32))
        y = v4_tfold(x + acc.astype(dt) * 0, k)
        acc += jnp.sum(y.astype(jnp.float32))
        return acc

    print(f"backend: {jax.default_backend()} | N = {n} | "
          "order: v0, v3_s2d, v4_tfold", flush=True)
    capture(lambda: float(program(x, k, k2j)), "/tmp/vidtok_prof_ci2")
    parse("/tmp/vidtok_prof_ci2")


if __name__ == "__main__":
    main()
