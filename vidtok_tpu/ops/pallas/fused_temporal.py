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


def _stream_kernel(x_ref, c1_ref, c2_ref, ln1_s, ln1_b, w1, b1, ln2_s,
                   ln2_b, w2, b2, out_ref, nc1_ref, nc2_ref, *, t, tile_s,
                   first_chunk, offset, silu_fast, kpack=False):
    """Streaming chunk step of the temporal resblock.

    Cache semantics are exactly the unfused CausalConv1d's (conv.py
    streaming branch): each conv carries the last 2 frames of its INPUT
    (the activated tensor), stored as if the trailing ``offset`` frames
    were never seen (overlap-tiled decode, reference
    autoencoder_v1_1.py:212-216). ``first_chunk`` replicates the chunk's
    first activated frame instead of reading the cache.
    """
    x = x_ref[0]                       # [t, tile_s, C]
    dtype = x.dtype
    ln = act.impl(silu_fast, None)

    def activate(v, s, b):
        if silu_fast:
            return ln(v, s[:], b[:], 1e-6)
        return _ln_silu(v, s[:], b[:]).astype(dtype)

    a1 = activate(x, ln1_s, ln1_b)
    if first_chunk:
        front1 = jnp.concatenate([a1[0:1]] * 2, axis=0)
    else:
        front1 = c1_ref[0].astype(dtype)
    full1 = jnp.concatenate([front1, a1], axis=0)      # [t+2, tile_s, C]
    h = _tconv3(full1, w1[:], t, tile_s, kpack=kpack) + b1[:]

    a2 = activate(h.astype(dtype), ln2_s, ln2_b)
    if first_chunk:
        front2 = jnp.concatenate([a2[0:1]] * 2, axis=0)
    else:
        front2 = c2_ref[0].astype(dtype)
    full2 = jnp.concatenate([front2, a2], axis=0)
    y = _tconv3(full2, w2[:], t, tile_s, kpack=kpack) + b2[:]

    out_ref[0] = (x.astype(jnp.float32) + y).astype(dtype)
    L = t + 2
    nc1_ref[0] = jax.lax.slice_in_dim(full1, L - offset - 2, L - offset,
                                      axis=0)
    nc2_ref[0] = jax.lax.slice_in_dim(full2, L - offset - 2, L - offset,
                                      axis=0)


def _kernel(x_ref, ln1_s, ln1_b, w1, b1, ln2_s, ln2_b, w2, b2,
            out_ref, *, t, tile_s, replicate, silu_fast, kpack=False,
            ablate="", split=1):
    # ``ablate`` (probe-only, wrong numerics): 'noln' replaces both
    # ln_silu passes by identity (isolates the VPU pointwise cost),
    # 'noconv' skips the tap matmuls (isolates MXU + DMA cost). Used by
    # tools/probe_temporal_attrib.py.
    #
    # ``split`` > 1 processes the spatial tile as ``split`` independent
    # column chains, python-unrolled in one body: the chains share no
    # data, so the instruction scheduler is free to overlap one chain's
    # VPU ln_silu with another's MXU tap matmuls (the temporal ablation
    # probe puts ln at ~62% of the step with the MXU mostly idle).
    x = x_ref[0]  # [T, tile_s, C]
    dtype = x.dtype

    def activate(v, s, b):
        if "noln" in ablate:
            return v.astype(dtype)
        if silu_fast:
            return act.impl(silu_fast, None)(v, s[:], b[:], 1e-6)
        return _ln_silu(v, s[:], b[:]).astype(dtype)

    def body(xs, ts):
        a1 = activate(xs, ln1_s, ln1_b)
        a1p = _pad_front(a1, 2, replicate)
        if "noconv" in ablate:
            h = a1p[2:] * jnp.float32(1.0000001).astype(dtype)
        else:
            h = _tconv3(a1p, w1[:], t, ts, kpack=kpack) + b1[:]

        a2 = activate(h.astype(dtype), ln2_s, ln2_b)
        a2p = _pad_front(a2, 2, replicate)
        if "noconv" in ablate:
            y = a2p[2:].astype(jnp.float32)
        else:
            y = _tconv3(a2p, w2[:], t, ts, kpack=kpack) + b2[:]
        return (xs.astype(jnp.float32) + y).astype(dtype)

    if split == 1:
        out_ref[0] = body(x, tile_s)
    else:
        hs = tile_s // split
        outs = [body(x[:, i * hs:(i + 1) * hs], hs) for i in range(split)]
        out_ref[0] = jnp.concatenate(outs, axis=1)


import os as _os

_TILE_S = int(_os.environ.get("VIDTOK_FUSE_TEMPORAL_TILE", "64"))
_KPACK = _os.environ.get("VIDTOK_TEMPORAL_KPACK", "0") == "1"


_SPLIT = int(_os.environ.get("VIDTOK_TEMPORAL_SPLIT", "1"))


def _fit_tile(t_eff, s, c):
    """Shared VMEM-budgeted spatial tile selection for both the batch and
    streaming kernels (single source of truth — ADVICE r4).

    Tile default: sweep at serving shapes (bench_artifacts/probe_ttile.log):
    t164_c128 6.09/6.02/7.27 ms and t82_c256 1.82/1.81/2.12 at tile
    32/64/128 — 64 beats the old 128 default by ~20% at level 0.
    VIDTOK_FUSE_TEMPORAL_TILE != 64 selects experimental VMEM-budgeted
    scaling (tile_s*C constant).

    Budget: the block is [1, t_eff, tile_s, c]; VMEM scales with t_eff, and
    Mosaic kills the whole compile (relay HTTP 500) when the block's f32
    working set blows the 16 MB scoped-VMEM limit. Hardware probe
    (tools/probe_kernel_shapes.py, v5e): t*tile_s*c = 1,179,648 and 819,200
    FAIL; 688,128 (84x64x128, the T=81 serving graph) passes. Shrink by
    powers of two to stay inside the proven ceiling; VIDTOK_VMEM_LIMIT_MB
    scales it via tuning.budget_scale(). Returns None when no aligned
    in-budget tile exists (caller falls back to the unfused module path).
    """
    tile_s = max(32, min(_TILE_S * 128 // c, 512)) if _TILE_S != 64 else 64
    budget = 84 * 64 * 128 * tuning.budget_scale()
    while tile_s > 8 and t_eff * tile_s * c > budget:
        tile_s //= 2
    if t_eff * tile_s * c > budget:
        return None  # extreme T: caller uses the XLA module path
    while s % tile_s != 0 and tile_s > 8:
        tile_s //= 2
    # No aligned tile exists (e.g. odd H*W like 17x17=289): grid s//tile_s
    # would leave the tail of the output uninitialized.
    return tile_s if s % tile_s == 0 else None


def fused_temporal_resblock(x, params, first_pad_mode: str = "zero",
                            tile_s: int = None, interpret: bool = None,
                            silu_fast: bool = None, kpack: bool = None,
                            ablate: str = "", split: int = None):
    """x: [B, T, H, W, C] -> same. Equal in/out channels (every temporal
    resblock in the architecture); layernorm only.

    params: flax subtree {'norm1': {scale,bias}, 'conv1': {kernel
    [3,1,1,C,C], bias}, 'norm2', 'conv2'}.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = x.shape
    s = h * w
    if tile_s is None:
        tile_s = _fit_tile(t, s, c)
        if tile_s is None:
            return None
    else:
        # explicit probe tile: align to s only (budget is the probe's call)
        while s % tile_s != 0 and tile_s > 8:
            tile_s //= 2
        if s % tile_s != 0:
            return None
    xf = x.reshape(b, t, s, c)
    dtype = x.dtype
    k1 = params["conv1"]["kernel"].reshape(3, c, c).astype(dtype)
    k2 = params["conv2"]["kernel"].reshape(3, c, c).astype(dtype)

    split = _SPLIT if split is None else split
    if tile_s % max(split, 1) or (tile_s // max(split, 1)) % 8:
        split = 1
    kern = functools.partial(_kernel, t=t, tile_s=tile_s,
                             replicate=(first_pad_mode == "replicate"),
                             silu_fast=act.resolve(silu_fast),
                             kpack=_KPACK if kpack is None else kpack,
                             ablate=ablate, split=split)
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


def stream_tile(t, s, c):
    """Aligned spatial tile for the streaming kernel's [1, t+2, tile, C]
    blocks (same hardware-proven VMEM budget as the batch kernel), or
    None when no tile fits — caller falls back to the unfused path."""
    return _fit_tile(t + 2, s, c)


def fused_temporal_resblock_stream(x, params, c1, c2, *,
                                   first_chunk: bool, offset: int = 0,
                                   interpret: bool = None,
                                   silu_fast: bool = None,
                                   kpack: bool = None):
    """Streaming chunk step: x [B,t,H,W,C] + per-conv input caches
    c1/c2 [B,2,H,W,C] -> (y, new_c1, new_c2), matching the unfused
    CausalConv1d streaming semantics exactly (replicate-first-frame at
    stream start, cache = input tail stored ``offset`` frames back for
    overlap-tiled decode). Returns None when no aligned tile exists.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = x.shape
    if t < offset:
        return None  # cache slice would cross the chunk boundary
    s = h * w
    tile_s = stream_tile(t, s, c)
    if tile_s is None:
        return None
    dtype = x.dtype
    xf = x.reshape(b, t, s, c)
    k1 = params["conv1"]["kernel"].reshape(3, c, c).astype(dtype)
    k2 = params["conv2"]["kernel"].reshape(3, c, c).astype(dtype)

    kern = functools.partial(_stream_kernel, t=t, tile_s=tile_s,
                             first_chunk=first_chunk, offset=offset,
                             silu_fast=act.resolve(silu_fast),
                             kpack=_KPACK if kpack is None else kpack)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    xspec = pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((1, 2, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
    y, nc1, nc2 = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((b, t, s, c), dtype),
                   jax.ShapeDtypeStruct((b, 2, s, c), dtype),
                   jax.ShapeDtypeStruct((b, 2, s, c), dtype)),
        grid=(b, s // tile_s),
        in_specs=[xspec, cspec, cspec] + [vspec] * 8,
        out_specs=(xspec, cspec, cspec),
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(
        xf, c1.reshape(b, 2, s, c), c2.reshape(b, 2, s, c),
        params["norm1"]["scale"].astype(jnp.float32),
        params["norm1"]["bias"].astype(jnp.float32),
        k1, params["conv1"]["bias"].astype(jnp.float32),
        params["norm2"]["scale"].astype(jnp.float32),
        params["norm2"]["bias"].astype(jnp.float32),
        k2, params["conv2"]["bias"].astype(jnp.float32),
    )
    return (y.reshape(b, t, h, w, c), nc1.reshape(b, 2, h, w, c),
            nc2.reshape(b, 2, h, w, c))
