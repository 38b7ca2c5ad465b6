"""Pallas TPU kernel: parity-upsample blend + interleave epilogue.

The parity temporal-upsample fast path (modules/blocks.py
``_parity_up2x_conv_blend``) ends with:

  yc   = (y_cur + shift1(y_prev)) + bias          # phase-packed [...,2C]
  y    = alpha * s[..., None, :] + (1-alpha) * yc  # residual blend
  out  = transpose-interleave parity into time     # [B, 2T, H, W, C]

As XLA ops that tail costs ~9 ms at decoder level 1 (an add fusion, two
transpose copies and a broadcast-multiply over ~GB-scale tensors). This
kernel performs the whole tail in ONE bandwidth-optimal pass: grid
(B, T, S/tile); each step reads the s / y_cur tiles at frame t and the
y_prev tile at frame t-1 (clamped; the t==0 front pad is zeros for v1.0
'zero' mode, y_prev[0] for 'replicate') and writes BOTH output parity
frames [2t, 2t+1] directly — no phase-packed intermediate ever
materializes in HBM.

Reference semantics: TimeUpsampleResCausal2x, model_3dcausal.py:255-273.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtok_tpu.ops.pallas import tuning


def _kernel(s_ref, yc_ref, yp_ref, bias2_ref, alpha_ref, out_ref, *,
            c, replicate):
    t = pl.program_id(1)
    dt = s_ref.dtype
    s = s_ref[0, 0].astype(jnp.float32)          # [tile, C]
    yc = yc_ref[0, 0].astype(jnp.float32)        # [tile, 2C]
    yp = yp_ref[0, 0].astype(jnp.float32)        # frame t-1 (clamped)
    if not replicate:
        yp = jnp.where(t == 0, jnp.zeros_like(yp), yp)
    y = yc + yp + bias2_ref[:].astype(jnp.float32)
    alpha = alpha_ref[0].astype(jnp.float32)
    out_ref[0, 0] = (alpha * s + (1.0 - alpha) * y[:, :c]).astype(dt)
    out_ref[0, 1] = (alpha * s + (1.0 - alpha) * y[:, c:]).astype(dt)


def parity_blend_interleave(s, y_cur, y_prev, bias, alpha,
                            first_pad_mode: str = "zero",
                            tile_s: int = 256, interpret: bool = None):
    """s: [B,T,H,W,C]; y_cur/y_prev: [B,T,H,W,2C] phase-packed conv
    outputs; bias: [C]; alpha: scalar. Returns [B,2T,H,W,C] (or None when
    no aligned spatial tile exists — caller falls back to the XLA tail)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = s.shape
    sp = h * w
    while sp % tile_s != 0 and tile_s > 8:
        tile_s //= 2
    if sp % tile_s != 0:
        return None
    sf = s.reshape(b, t, sp, c)
    ycf = y_cur.reshape(b, t, sp, 2 * c)
    ypf = y_prev.reshape(b, t, sp, 2 * c)
    bias2 = jnp.concatenate([bias, bias]).astype(jnp.float32)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1)

    kern = functools.partial(_kernel, c=c,
                             replicate=(first_pad_mode == "replicate"))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 2 * t, sp, c), s.dtype),
        grid=(b, t, sp // tile_s),
        in_specs=[
            pl.BlockSpec((1, 1, tile_s, c), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_s, 2 * c),
                         lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_s, 2 * c),
                         lambda i, j, k: (i, jnp.maximum(j - 1, 0), k, 0),
                         memory_space=pltpu.VMEM),
            vspec, vspec,
        ],
        out_specs=pl.BlockSpec((1, 2, tile_s, c),
                               lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(sf, ycf, ypf, bias2, alpha_arr)
    return out.reshape(b, 2 * t, h, w, c)


def parity_blend_interleave4(s, y4, bias, alpha, first_pad_mode: str = "zero",
                             tile_s: int = 256, interpret: bool = None):
    """Same tail as :func:`parity_blend_interleave` but for the merged
    single-conv form: ``y4`` is [B,T,H,W,4C] with channels
    ``[cur-taps (2C) | prev-taps (2C)]`` from ONE C->4C conv (one conv
    input layout copy instead of two). The kernel reads the cur half at
    frame t and the prev half at frame t-1 by passing ``y4`` twice with
    different channel-block index maps."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = s.shape
    sp = h * w
    while sp % tile_s != 0 and tile_s > 8:
        tile_s //= 2
    if sp % tile_s != 0:
        return None
    sf = s.reshape(b, t, sp, c)
    y4f = y4.reshape(b, t, sp, 4 * c)
    bias2 = jnp.concatenate([bias, bias]).astype(jnp.float32)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1)

    kern = functools.partial(_kernel, c=c,
                             replicate=(first_pad_mode == "replicate"))
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, 2 * t, sp, c), s.dtype),
        grid=(b, t, sp // tile_s),
        in_specs=[
            pl.BlockSpec((1, 1, tile_s, c), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            # cur-tap half: channel block 0 at frame t
            pl.BlockSpec((1, 1, tile_s, 2 * c),
                         lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            # prev-tap half: channel block 1 at frame t-1 (clamped)
            pl.BlockSpec((1, 1, tile_s, 2 * c),
                         lambda i, j, k: (i, jnp.maximum(j - 1, 0), k, 1),
                         memory_space=pltpu.VMEM),
            vspec, vspec,
        ],
        out_specs=pl.BlockSpec((1, 2, tile_s, c),
                               lambda i, j, k: (i, j, k, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(sf, y4f, y4f, bias2, alpha_arr)
    return out.reshape(b, 2 * t, h, w, c)
