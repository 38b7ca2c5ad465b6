"""Pallas TPU kernel: fused temporal residual block.

Computes ``y = x + conv2_t(silu(ln2(conv1_t(silu(ln1(x))))))`` where
conv*_t are causal k=3 temporal convs — i.e. ``ResnetBlockTemporal`` with
layernorm, non-streaming. The TPU profile shows the unfused path spends
~25% of device time in elementwise/norm HBM passes (partial-sum adds from
the decomposed temporal convs, fp32 norm statistic converts); this kernel
does the whole block in one VMEM-resident pass per spatial tile.

Tiling: x is viewed as [B, T, S, C] (S = H*W); grid (B, S/TILE_S) with
block [1, T, TILE_S, C] — the full T axis lives in the tile, so the causal
pad and the k=3 shifts are plain leading-axis slices (always
Mosaic-aligned; no halo DMA needed).

``first_pad_mode``: 'zero' (v1.0) pads the activated tensor with zero
frames; 'replicate' (v1.1 single-shot) repeats its first frame. Streaming
calls fall back to the unfused module path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtok_tpu.ops.pallas import act, tuning


def _ln_silu(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    return y * jax.nn.sigmoid(y)


def _pad_front(a, n, replicate):
    if replicate:
        front = jnp.concatenate([a[0:1]] * n, axis=0)
    else:
        front = jnp.zeros((n,) + a.shape[1:], a.dtype)
    return jnp.concatenate([front, a], axis=0)


def _tconv3(a_pad, w, t_out, ts, kpack=False):
    """a_pad: [t_out+2, ts, Cin]; w: [3, Cin, Cout] -> [t_out, ts, Cout].

    ``kpack=True`` lane-concatenates the three time-tap views into one
    [t_out, ts, 3Cin] operand and runs ONE K=3Cin matmul (the taps are
    leading-axis slices, so the concat is the only copy): 3 MXU issues +
    3 f32 acc read-modify-writes become 1.
    """
    cin = a_pad.shape[-1]
    cout = w.shape[-1]
    if kpack:
        a = jnp.concatenate([a_pad[j:j + t_out] for j in range(3)],
                            axis=-1).reshape(t_out * ts, 3 * cin)
        acc = jnp.dot(a, w.reshape(3 * cin, cout),
                      preferred_element_type=jnp.float32)
        return acc.reshape(t_out, ts, cout)
    acc = jnp.zeros((t_out * ts, cout), jnp.float32)
    for j in range(3):
        a = a_pad[j:j + t_out].reshape(t_out * ts, cin)
        acc = acc + jnp.dot(a, w[j], preferred_element_type=jnp.float32)
    return acc.reshape(t_out, ts, cout)


def _kernel(x_ref, ln1_s, ln1_b, w1, b1, ln2_s, ln2_b, w2, b2,
            out_ref, *, t, tile_s, replicate, silu_fast, kpack=False):
    x = x_ref[0]  # [T, tile_s, C]
    dtype = x.dtype

    if silu_fast:
        ln = act.impl(silu_fast, None)
        a1 = ln(x, ln1_s[:], ln1_b[:], 1e-6)
    else:
        a1 = _ln_silu(x, ln1_s[:], ln1_b[:]).astype(dtype)
    a1p = _pad_front(a1, 2, replicate)
    h = _tconv3(a1p, w1[:], t, tile_s, kpack=kpack) + b1[:]

    if silu_fast:
        a2 = ln(h.astype(dtype), ln2_s[:], ln2_b[:], 1e-6)
    else:
        a2 = _ln_silu(h, ln2_s[:], ln2_b[:]).astype(dtype)
    a2p = _pad_front(a2, 2, replicate)
    y = _tconv3(a2p, w2[:], t, tile_s, kpack=kpack) + b2[:]

    out_ref[0] = (x.astype(jnp.float32) + y).astype(dtype)


import os as _os

_TILE_S = int(_os.environ.get("VIDTOK_FUSE_TEMPORAL_TILE", "128"))
_KPACK = _os.environ.get("VIDTOK_TEMPORAL_KPACK", "0") == "1"


def fused_temporal_resblock(x, params, first_pad_mode: str = "zero",
                            tile_s: int = None, interpret: bool = None,
                            silu_fast: bool = None, kpack: bool = None):
    """x: [B, T, H, W, C] -> same. Equal in/out channels (every temporal
    resblock in the architecture); layernorm only.

    params: flax subtree {'norm1': {scale,bias}, 'conv1': {kernel
    [3,1,1,C,C], bias}, 'norm2', 'conv2'}.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = x.shape
    if tile_s is None:
        if _TILE_S != 128:
            # experimental VMEM-budgeted scaling (tile_s*C constant)
            tile_s = max(64, min(_TILE_S * 128 // c, 512))
        else:
            tile_s = 128  # measured default (61.4 fps end-to-end)
        # The block is [1, t, tile_s, c]: VMEM scales with t, and Mosaic
        # kills the whole compile (relay HTTP 500) when the block's f32
        # working set blows the 16 MB scoped-VMEM limit. Hardware probe
        # (tools/probe_kernel_shapes.py, v5e): t*tile_s*c = 1,179,648
        # (36x128x256 and 18x128x512) and 819,200 (100x64x128) FAIL;
        # 688,128 (84x64x128 and 21x64x512, the T=81 serving graph)
        # passes. Shrink by powers of two to stay inside the proven
        # ceiling. T=17 flagship blocks (<= 655,360) are unaffected.
        # VIDTOK_VMEM_LIMIT_MB raises Mosaic's limit via compiler_params
        # (tuning.py); the proven budget scales with it.
        budget = 84 * 64 * 128 * tuning.budget_scale()
        while tile_s > 8 and t * tile_s * c > budget:
            tile_s //= 2
        if t * tile_s * c > budget:
            return None  # extreme T: caller uses the XLA module path
    s = h * w
    while s % tile_s != 0 and tile_s > 8:
        tile_s //= 2
    if s % tile_s != 0:
        # No aligned tile exists (e.g. odd H*W like 17x17=289): grid
        # s//tile_s would leave the tail of the output uninitialized.
        # Caller falls back to the unfused module path.
        return None
    xf = x.reshape(b, t, s, c)
    dtype = x.dtype
    k1 = params["conv1"]["kernel"].reshape(3, c, c).astype(dtype)
    k2 = params["conv2"]["kernel"].reshape(3, c, c).astype(dtype)

    kern = functools.partial(_kernel, t=t, tile_s=tile_s,
                             replicate=(first_pad_mode == "replicate"),
                             silu_fast=act.resolve(silu_fast),
                             kpack=_KPACK if kpack is None else kpack)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, t, s, c), dtype),
        grid=(b, s // tile_s),
        in_specs=[
            pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ] + [vspec] * 8,
        out_specs=pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(
        xf,
        params["norm1"]["scale"].astype(jnp.float32),
        params["norm1"]["bias"].astype(jnp.float32),
        k1, params["conv1"]["bias"].astype(jnp.float32),
        params["norm2"]["scale"].astype(jnp.float32),
        params["norm2"]["bias"].astype(jnp.float32),
        k2, params["conv2"]["bias"].astype(jnp.float32),
    )
    return out.reshape(b, t, h, w, c)
