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

_DEFAULT_FAST = os.environ.get("VIDTOK_SILU_FAST", "1") == "1"


def default_fast() -> bool:
    return _DEFAULT_FAST


def resolve(silu_fast) -> bool:
    return _DEFAULT_FAST if silu_fast is None else bool(silu_fast)


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
