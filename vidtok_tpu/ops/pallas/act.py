"""Shared fast layernorm+SiLU variant for the fused Pallas kernels.

The T=161 device traces put the fused temporal kernels at ~50 us/grid
step of which only ~21 us is tap matmuls — the rest is dominated by the
f32 ln_silu elementwise work (2 reduction passes + normalize + logistic,
all in f32 lanes). This variant keeps the moment statistics in f32 (the
reductions are where precision matters) but runs the normalize/scale and
the SiLU nonlinearity in the tile's own dtype — bf16 lanes have 2x VPU
throughput — with sigmoid expressed through tanh (hardware probe
bench_artifacts/probe_silu_bf16.log: bf16 tanh 1.042 ms vs f32 logistic
1.163 ms per pass; Mosaic's bf16 logistic lowering trips a verifier bug,
tanh does not).

Numerics: identical stats, normalize rounded to dtype one multiply
earlier than the exact form; for bf16 serving this moves outputs by
O(1) ULP and is gated by the recorded end-to-end PSNR parity protocol
(tools/parity_psnr.py; BASELINE claim <=0.05 dB).

Default ON since round 4: certified end-to-end on hardware — serving
parity delta 0.0017 dB (bench_artifacts/parity_silufast.log) and
headline 130.5 -> 137.7 fps (bench_artifacts/bench_silufast.log).
``VIDTOK_SILU_FAST=0`` restores the exact-f32 pointwise form; kernels
also take an explicit ``silu_fast`` argument for in-program A/B probes.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

def _parse(raw):
    if raw in ("mxu", "bf16"):
        return raw
    return raw == "1"


_DEFAULT_FAST = _parse(os.environ.get("VIDTOK_SILU_FAST", "1"))


def default_fast():
    return _DEFAULT_FAST


def resolve(silu_fast):
    """None -> env default; otherwise False / True / 'mxu' verbatim."""
    return _DEFAULT_FAST if silu_fast is None else silu_fast


def ln_silu_mxu(x, g, b, eps):
    """LayerNorm + SiLU with MXU-computed channel statistics.

    The VPU forms (``_ln_silu``/``ln_silu_fast``) reduce mean/E[x^2] over
    the 128-lane channel dim with a log-tree of lane rotations and then
    broadcast the scalars back across lanes — ~2x7 full-tensor VPU passes
    per norm. Here both stats come from ONE matmul each against a splat
    ones [C, C] matrix: the MXU returns the channel SUM replicated across
    all N=C lanes (pre-broadcast), costing ~1 conv-tap-equivalent per
    stat. x^2 is formed in the tile dtype before its matmul (bf16
    squares; the 128-term f32 accumulation averages the rounding out) —
    like ln_silu_fast this is an O(1)-ULP-of-bf16 contract change, gated
    by the end-to-end serving-parity protocol (tools/parity_psnr.py).
    """
    dt = x.dtype
    c = x.shape[-1]
    m2 = x.reshape(-1, c)
    ones = jnp.ones((c, c), dt)
    inv = 1.0 / c
    mu = (jax.lax.dot_general(m2, ones, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          * inv).reshape(x.shape)
    e2 = (jax.lax.dot_general(m2 * m2, ones, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          * inv).reshape(x.shape)
    rs = jax.lax.rsqrt(jnp.maximum(e2 - mu * mu, 0.0) + eps)
    y = (x - mu.astype(dt)) * rs.astype(dt) * g.astype(dt) + b.astype(dt)
    sig = jnp.tanh(y * jnp.asarray(0.5, dt)) * jnp.asarray(0.5, dt) \
        + jnp.asarray(0.5, dt)
    return y * sig


def impl(silu_fast_resolved, exact_fn):
    """Map a resolved ``silu_fast`` value (False/True/'mxu'/'bf16') to
    the ln_silu implementation a kernel should use; ``exact_fn`` is the
    kernel's own exact-f32 form (used when False)."""
    if silu_fast_resolved == "mxu":
        return ln_silu_mxu
    if silu_fast_resolved == "bf16":
        return ln_silu_bf16s
    return ln_silu_fast if silu_fast_resolved else exact_fn


def ln_silu_bf16s(x, g, b, eps):
    """LayerNorm + SiLU with dtype-lane (bf16) statistics.

    The temporal-kernel ablation (bench_artifacts/probe_temporal_attrib
    .log) puts ln_silu at ~62% of the kernel and the f32 stat passes at
    ~2/3 of THAT — the f32 cast plus two f32 lane-reduce trees move 2x
    the vreg traffic of bf16. This variant keeps everything in the tile
    dtype except the final rsqrt: the mean tree rounds at ~2^-9 relative
    per step, and variance is computed CENTER-FIRST — E[(x-mu_hat)^2]
    with the bf16 mu_hat — so there is no E[x^2]-mu^2 cancellation and a
    mean error only ADDS mu_err^2 (quadratically small) to the variance.
    O(2^-9)-relative contract change, gated by the end-to-end serving
    PSNR-parity protocol (tools/parity_psnr.py) before any default flip.
    """
    dt = x.dtype
    mu = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    rs = jax.lax.rsqrt(var.astype(jnp.float32) + eps).astype(dt)
    y = xc * rs * g.astype(dt) + b.astype(dt)
    sig = jnp.tanh(y * jnp.asarray(0.5, dt)) * jnp.asarray(0.5, dt) \
        + jnp.asarray(0.5, dt)
    return y * sig


def ln_silu_fast(x, g, b, eps):
    """LayerNorm (channel-minor) + SiLU; f32 stats, dtype-lane pointwise.

    x: [..., C] tile in its compute dtype; g/b: f32 [C]. Returns x.dtype.
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    rs = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (x - mu.astype(dt)) * rs.astype(dt) * g.astype(dt) + b.astype(dt)
    sig = jnp.tanh(y * jnp.asarray(0.5, dt)) * jnp.asarray(0.5, dt) \
        + jnp.asarray(0.5, dt)
    return y * sig
