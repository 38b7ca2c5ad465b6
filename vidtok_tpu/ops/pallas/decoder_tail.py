"""Pallas TPU kernel: decoder tail — layernorm + SiLU + causal (3,3,3)
conv to RGB, streamed over time with a VMEM ring buffer.

The decoder ends with ``norm_out -> silu -> CausalConv3d(C, 3, (3,3,3))``
(reference model_3dcausal.py:846-885). XLA handles the narrow 3-channel
output badly — it pads the output lanes and burns full-width passes
(profiled 12.2 ms/clip at B=4: conv_out 7.9 + norm stats 2.9 + silu mul
1.5). This kernel makes the time dimension the innermost grid axis and
keeps a 3-slot ring of normalized+silu'd row tiles in VMEM, so each
input row tile is read from HBM ONCE and every temporal tap reuses the
ring — the TPU-native form of causal streaming.

Grid (B, H/R, T); per step:
  1. read row tile [R, W, C] + 1-row halos (aligned 1-row halo block
     operands, zeroed at frame edges),
  2. layernorm (per-position, f32 stats — ChannelLayerNorm semantics,
     norms.py) + silu, W-pad, store into ring[t % 3],
  3. accumulate the causal conv from ring slots for frames t-2, t-1, t
     (27 tap matmuls, f32 accumulate, output channels padded 3 -> 8),
     with the reference's stream-start pad: 'replicate' taps frame 0,
     'zero' masks the missing-frame contributions.

The caller slices the padded output [..., :3].

Inference-only (no VJP); callers gate on determinism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtok_tpu.ops.pallas import tuning

_PAD_CO = 8  # output channels padded to one sublane-friendly group


def _ln_silu(xa, g, b, eps):
    dt = xa.dtype
    xf = xa.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps)
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    yf = y.astype(dt).astype(jnp.float32)
    return (yf * jax.lax.logistic(yf)).astype(dt)


def _kernel(xm_ref, xt_ref, xb_ref, g_ref, b_ref, km_ref, bias_ref,
            out_ref, ring_ref, *, eps, replicate, r, pre_shift=True):
    j = pl.program_id(1)
    t = pl.program_id(2)
    nj = pl.num_programs(1)

    @pl.when(t == 0)
    def _zero_ring():
        ring_ref[...] = jnp.zeros_like(ring_ref)

    xm = xm_ref[0, 0]                         # [R, W, C]
    top = xt_ref[0, 0]                        # [1, W, C]
    bot = xb_ref[0, 0]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == nj - 1, jnp.zeros_like(bot), bot)
    xa = jnp.concatenate([top, xm, bot], axis=0)        # [R+2, W, C]
    h = _ln_silu(xa, g_ref[:], b_ref[:], eps)
    # conv's SAME padding is zeros AFTER norm+silu (ln_silu(0) != 0 when
    # the norm bias is nonzero) — kill the activated frame-edge halo rows
    ra = h.shape[0]
    aidx = jax.lax.broadcasted_iota(jnp.int32, (ra, 1, 1), 0)
    akill = jnp.logical_or(jnp.logical_and(j == 0, aidx == 0),
                           jnp.logical_and(j == nj - 1, aidx == ra - 1))
    h = jnp.where(akill, jnp.zeros_like(h), h)
    w = xm.shape[1]
    c = xm.shape[2]
    if pre_shift:
        # store the three W-shift variants so every tap matmul reads an
        # aligned leading-dim slice (see fused_spatial_v2._conv3x3)
        z = jnp.zeros((h.shape[0], 1, c), h.dtype)
        ring_ref[t % 3, 0] = jnp.concatenate([z, h[:, :w - 1]], axis=1)
        ring_ref[t % 3, 1] = h
        ring_ref[t % 3, 2] = jnp.concatenate([h[:, 1:], z], axis=1)
    else:
        ring_ref[t % 3, 0] = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))

    acc = jnp.zeros((r * w, _PAD_CO), jnp.float32)
    for tap in range(3):
        src = t - 2 + tap
        hd = ring_ref[jnp.maximum(src, 0) % 3]
        part = jnp.zeros((r * w, _PAD_CO), jnp.float32)
        for dr in range(3):
            for dw in range(3):
                if pre_shift:
                    xs = hd[dw, dr:dr + r].reshape(r * w, c)
                else:
                    xs = hd[0, dr:dr + r, dw:dw + w, :].reshape(r * w, c)
                part += jax.lax.dot_general(
                    xs, km_ref[tap, dr, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        if replicate:
            acc += part                       # frame -1/-2 pad == frame 0
        else:
            acc += jnp.where(src >= 0, part, jnp.zeros_like(part))
    acc += bias_ref[:].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(xm.dtype).reshape(r, w, _PAD_CO)


def decoder_tail_rgb(x, norm_params, conv_params, first_pad_mode,
                     *, eps: float = 1e-6, row_tile: int = 8,
                     interpret=None, pre_shift: bool = True):
    """x: [B, T, H, W, C] -> [B, T, H, W, Cout] or None (unfit shapes).

    ``norm_params``: ChannelLayerNorm {scale, bias}; ``conv_params``:
    CausalConv3d {kernel [3,3,3,C,Cout], bias [Cout]} with Cout <= 8.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = x.shape
    km = conv_params["kernel"]
    co = km.shape[-1]
    r = row_tile
    while h % r and r > 2:
        r //= 2
    if co > _PAD_CO or km.shape[:3] != (3, 3, 3) or h % r or h < r:
        return None
    if not interpret and (w % 128 or c % 128):
        return None
    dt = x.dtype

    g = norm_params["scale"].astype(jnp.float32)
    bb = norm_params["bias"].astype(jnp.float32)
    km8 = jnp.pad(km.astype(dt), ((0, 0),) * 4 + ((0, _PAD_CO - co),))
    bias8 = jnp.pad(conv_params["bias"].astype(jnp.float32),
                    (0, _PAD_CO - co))

    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps,
                          replicate=(first_pad_mode == "replicate"), r=r,
                          pre_shift=pre_shift),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, _PAD_CO), dt),
        grid=(b, h // r, t),
        in_specs=[
            pl.BlockSpec((1, 1, r, w, c),
                         lambda i, j, k: (i, k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # 1-row halo blocks (row-block index == row number)
            pl.BlockSpec((1, 1, 1, w, c),
                         lambda i, j, k, _r=r: (
                             i, k, jnp.maximum(j * _r - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c),
                         lambda i, j, k, _r=r, _h=h: (
                             i, k, jnp.minimum(j * _r + _r, _h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            vfull, vfull, vfull, vfull,
        ],
        out_specs=pl.BlockSpec((1, 1, r, w, _PAD_CO),
                               lambda i, j, k: (i, k, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, 3, r + 2, w, c) if pre_shift
                                   else (3, 1, r + 2, w + 2, c), dt)],
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(x, x, x, g, bb, km8, bias8)
    return out[..., :co]
