"""Pallas TPU kernel: fully-fused parity temporal upsample.

``TimeUpsampleRes2x`` (nearest, causal — reference TimeUpsampleResCausal2x,
model_3dcausal.py:255-273) decomposes by output parity into per-frame 2D
convs of the HALF-RATE input (modules/blocks.py _parity_up2x_conv_blend):

  y[2a]   = (K0+K1) (*) s[a-1] + K2      (*) s[a]
  y[2a+1] = K0      (*) s[a-1] + (K1+K2) (*) s[a]
  out     = alpha * s + (1-alpha) * (y + bias)     (parity-interleaved)

The XLA form (one C->4C conv + a Pallas blend tail) profiles at 24.3
ms/clip for decoder level 1 at B=4: 16.7 ms conv (near MXU peak) + 4.1 ms
conv-input layout copy + 3.5 ms tail. This kernel beats the MAC count
itself: it computes the THREE base convs K0,K1,K2 (C->3C, 25% fewer MACs
than the [cur|prev] 2x2C packing, whose K1 work is duplicated) and forms
the four parity/tap combinations with free VMEM adds. Time is the
innermost grid axis; the prev-frame taps ((K0+K1)s, K0 s) live in a
2-slot VMEM ring, so s is read once, nothing but the final output touches
HBM, and the conv-input copy disappears.

Wide channels chunk the OUTPUT channels over an extra grid axis (the
[3,3,C,3C] kernel operand would not fit VMEM at C=512); each chunk owns
its slice of every base kernel, the bias, the blend input and the ring.

Stream-start semantics: 'replicate' (s[-1] := s[0]) taps this step's own
prev-tap result at t==0; 'zero' taps zeros. Inference-only (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtok_tpu.ops.pallas import tuning


def _kernel(sm_ref, st_ref, sb_ref, sc_ref, kb_ref, bias_ref, alpha_ref,
            out_ref, ring_ref, *, r, cc, replicate, pre_shift=True):
    j = pl.program_id(2)
    t = pl.program_id(3)
    nj = pl.num_programs(2)
    dt = sm_ref.dtype

    sm = sm_ref[0, 0]                                   # [R, W, C]
    top = st_ref[0, 0]                                  # [1, W, C]
    bot = sb_ref[0, 0]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == nj - 1, jnp.zeros_like(bot), bot)
    xa = jnp.concatenate([top, sm, bot], axis=0)        # [R+2, W, C]

    w = sm.shape[1]
    c = sm.shape[2]
    acc = jnp.zeros((r * w, 3 * cc), jnp.float32)
    if pre_shift:
        # two W-shifted copies built once -> every tap operand is an
        # aligned leading-dim slice (no sublane-offset relayouts; see
        # fused_spatial_v2._conv3x3)
        z = jnp.zeros((xa.shape[0], 1, c), xa.dtype)
        srcs = (jnp.concatenate([z, xa[:, :w - 1]], axis=1), xa,
                jnp.concatenate([xa[:, 1:], z], axis=1))
        for dr in range(3):
            for dw in range(3):
                xs = srcs[dw][dr:dr + r].reshape(r * w, c)
                acc += jax.lax.dot_general(
                    xs, kb_ref[0, dr, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    else:
        hp = jnp.pad(xa, ((0, 0), (1, 1), (0, 0)))      # [R+2, W+2, C]
        for dr in range(3):
            for dw in range(3):
                xs = hp[dr:dr + r, dw:dw + w, :].reshape(r * w, c)
                acc += jax.lax.dot_general(
                    xs, kb_ref[0, dr, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    y0 = acc[:, :cc]
    y1 = acc[:, cc:2 * cc]
    y2 = acc[:, 2 * cc:]
    cur_e, cur_o = y2, y1 + y2                          # f32 [R*W, cc]
    prv_e = (y0 + y1).astype(dt)
    prv_o = y0.astype(dt)

    pe = ring_ref[(t + 1) % 2, 0].reshape(r * w, cc)    # frame t-1 taps
    po = ring_ref[(t + 1) % 2, 1].reshape(r * w, cc)
    if replicate:
        pe = jnp.where(t == 0, prv_e, pe)
        po = jnp.where(t == 0, prv_o, po)
    else:
        pe = jnp.where(t == 0, jnp.zeros_like(pe), pe)
        po = jnp.where(t == 0, jnp.zeros_like(po), po)
    ring_ref[t % 2, 0] = prv_e.reshape(r, w, cc)
    ring_ref[t % 2, 1] = prv_o.reshape(r, w, cc)

    sb2 = sc_ref[0, 0].astype(jnp.float32).reshape(r * w, cc)
    alpha = alpha_ref[0]
    bias = bias_ref[0, 0].astype(jnp.float32)
    oute = alpha * sb2 + (1.0 - alpha) * (cur_e + pe.astype(jnp.float32)
                                          + bias)
    outo = alpha * sb2 + (1.0 - alpha) * (cur_o + po.astype(jnp.float32)
                                          + bias)
    out_ref[0, 0] = oute.astype(dt).reshape(r, w, cc)
    out_ref[0, 1] = outo.astype(dt).reshape(r, w, cc)


def parity_up2x_fused(s, k, bias, alpha, first_pad_mode,
                      *, row_tile: int = 4, chunk_c: int = 256,
                      interpret=None, pre_shift: bool = True):
    """s: [B,T,H,W,C]; k: [3,3,3,C,C] causal conv kernel; bias: [C];
    alpha: scalar blend. Returns [B,2T,H,W,C] or None (unfit shapes)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = s.shape
    if k.shape != (3, 3, 3, c, c):
        return None
    r = row_tile
    while h % r and r > 1:
        r //= 2
    if h % r:
        return None
    cc = min(c, chunk_c)
    if c % cc:
        return None
    if not interpret and (w % 16 or c % 128 or cc % 128):
        return None
    # VMEM guard: the weight block [1,3,3,C,3cc] plus the row blocks put
    # Mosaic's scoped-VMEM accounting at 35 MB (C=512, w=128) and
    # 19.75 MB (C=256, w=256) in f32 — both over the 16 MB limit, both
    # killing the whole compile server-side — while the bf16 serving
    # graph is hardware-proven at the same shapes. Wide-channel f32
    # falls back to the caller's XLA parity path.
    if not interpret and c >= 256 and jnp.dtype(s.dtype).itemsize > 2:
        return None
    g = c // cc
    dt = s.dtype

    kd = k.astype(dt)
    # per-chunk base kernels: [G, 3(spatial dr), 3(dw), C, 3*cc] with the
    # three TEMPORAL taps' chunk slices side by side on the last dim
    kb = jnp.stack([
        jnp.concatenate([kd[0, ..., i * cc:(i + 1) * cc],
                         kd[1, ..., i * cc:(i + 1) * cc],
                         kd[2, ..., i * cc:(i + 1) * cc]], axis=-1)
        for i in range(g)], axis=0)
    bias_g = bias.astype(jnp.float32).reshape(g, 1, cc)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, r=r, cc=cc,
                          replicate=(first_pad_mode == "replicate"),
                          pre_shift=pre_shift),
        out_shape=jax.ShapeDtypeStruct((b, 2 * t, h, w, c), dt),
        grid=(b, g, h // r, t),
        in_specs=[
            # conv input: full C (the contraction needs every channel)
            pl.BlockSpec((1, 1, r, w, c),
                         lambda i, gg, j, kk: (i, kk, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c),
                         lambda i, gg, j, kk, _r=r: (
                             i, kk, jnp.maximum(j * _r - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, w, c),
                         lambda i, gg, j, kk, _r=r, _h=h: (
                             i, kk, jnp.minimum(j * _r + _r, _h - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            # blend input: this chunk's channels only
            pl.BlockSpec((1, 1, r, w, cc),
                         lambda i, gg, j, kk: (i, kk, j, 0, gg),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 3, c, 3 * cc),
                         lambda i, gg, j, kk: (gg, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cc), lambda i, gg, j, kk: (gg, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, r, w, cc),
                               lambda i, gg, j, kk: (i, kk, j, 0, gg),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, 2, r, w, cc), dt)],
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(s, s, s, s, kb, bias_g, alpha_arr)
    return out
