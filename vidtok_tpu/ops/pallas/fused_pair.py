"""Pallas TPU kernel: fused spatial+temporal residual block PAIR.

Every level of the encoder/decoder runs ``ResnetBlockSpatial`` directly
followed by ``ResnetBlockTemporal`` (reference spatial_temporal_resblk,
model_3dcausal.py:83-109). Run separately (fused_spatial_v2 + the
fused_temporal kernel) the intermediate activation makes a full HBM
round-trip between them — 570 MB per full-res block pair at B=4 — and the
temporal kernel pays its own dispatch/DMA overhead. This kernel runs the
WHOLE pair per row tile with time innermost:

  h   = x + conv2(silu(ln2(conv1(silu(ln1(x))))))        # spatial, 3x3
  out = h + tconv2(silu(tln2(tconv1(silu(tln1(h))))))    # temporal, k=3

The spatial part is fused_spatial_v2's body (aligned 2-row halo block
operands, frame-edge zero-pad semantics); the temporal part keeps
3-slot VMEM rings of the two activated tensors (a1 = silu(tln1(h)),
a2 = silu(tln2(tconv1 a1))) so the causal k=3 taps reuse them — the
reference's causal pad applies to the ACTIVATED tensors (CausalConv1d on
silu output), which the ring indexing reproduces: 'replicate' clamps the
tap to frame 0, 'zero' masks it.

Equal in/out channels only (every temporal resblock in the architecture;
spatial pairs with a nin_shortcut fall back to the separate kernels).
Inference-only (no VJP).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_spatial_v2 import _conv3x3, _ln_silu


def _kernel(xm_ref, xt_ref, xb_ref,
            g1_ref, b1_ref, k1_ref, c1b_ref, g2_ref, b2_ref, k2_ref,
            c2b_ref,
            tg1_ref, tb1_ref, tw1_ref, tb1c_ref,
            tg2_ref, tb2_ref, tw2_ref, tb2c_ref,
            out_ref, ring1_ref, ring2_ref, *, eps, replicate, r):
    j = pl.program_id(1)
    t = pl.program_id(2)
    nj = pl.num_programs(1)
    dt = xm_ref.dtype

    # ---- spatial residual block (fused_spatial_v2 body, no nin) ----
    xm = xm_ref[0, 0]                          # [R, W, C]
    top = xt_ref[0, 0]                         # [2, W, C]
    bot = xb_ref[0, 0]
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == nj - 1, jnp.zeros_like(bot), bot)
    xa = jnp.concatenate([top, xm, bot], axis=0)        # [R+4, W, C]
    h1 = _ln_silu(xa, g1_ref[:], b1_ref[:], eps)
    # conv1's SAME pad is zeros AFTER norm+silu (ln_silu(0) = silu(bias)
    # != 0) — kill the activated frame-edge halo rows
    ra = h1.shape[0]
    aidx = jax.lax.broadcasted_iota(jnp.int32, (ra, 1, 1), 0)
    akill = jnp.logical_or(jnp.logical_and(j == 0, aidx < 2),
                           jnp.logical_and(j == nj - 1, aidx >= ra - 2))
    h1 = jnp.where(akill, jnp.zeros_like(h1), h1)
    c1 = _conv3x3(h1, k1_ref[:], c1b_ref[:])            # [R+2, W, C]
    h2 = _ln_silu(c1, g2_ref[:], b2_ref[:], eps)
    rr = h2.shape[0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rr, 1, 1), 0)
    kill = jnp.logical_or(jnp.logical_and(j == 0, ridx == 0),
                          jnp.logical_and(j == nj - 1, ridx == rr - 1))
    h2 = jnp.where(kill, jnp.zeros_like(h2), h2)
    c2 = _conv3x3(h2, k2_ref[:], c2b_ref[:])            # [R, W, C]
    hsp = xm + c2

    # ---- temporal residual block over the VMEM rings ----
    w = hsp.shape[1]
    c = hsp.shape[2]
    a1 = _ln_silu(hsp, tg1_ref[:], tb1_ref[:], eps)     # [R, W, C]
    ring1_ref[t % 3] = a1

    def tconv(ring_ref, tw_ref, bias_ref):
        acc = jnp.zeros((r * w, c), jnp.float32)
        for tap in range(3):
            src = t - 2 + tap
            hd = ring_ref[jnp.maximum(src, 0) % 3].reshape(r * w, c)
            part = jax.lax.dot_general(
                hd, tw_ref[tap], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if not replicate:
                part = jnp.where(src >= 0, part, jnp.zeros_like(part))
            acc += part
        return (acc.astype(dt) + bias_ref[:].astype(dt)).reshape(r, w, c)

    y1 = tconv(ring1_ref, tw1_ref, tb1c_ref)
    a2 = _ln_silu(y1, tg2_ref[:], tb2_ref[:], eps)
    ring2_ref[t % 3] = a2
    y2 = tconv(ring2_ref, tw2_ref, tb2c_ref)
    out_ref[0, 0] = hsp + y2


def fused_pair_resblock(x, sp_params, tm_params, first_pad_mode,
                        *, eps: float = 1e-6, row_tile: int = 8,
                        interpret=None):
    """x: [B, T, H, W, C] -> same, or None (unfit shapes).

    ``sp_params``: ResnetBlockSpatial tree WITHOUT nin_shortcut;
    ``tm_params``: ResnetBlockTemporal tree (conv kernels [3,1,1,C,C])."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, t, h, w, c = x.shape
    if "nin_shortcut" in sp_params:
        return None
    if sp_params["conv1"]["kernel"].shape[-1] != c:
        return None
    r = row_tile
    if r % 2 or h % r or h < r + 2:
        return None
    if not interpret and (w % 16 or c % 128):
        return None
    dt = x.dtype

    def f32(a):
        return a.astype(jnp.float32)

    g1 = f32(sp_params["norm1"]["scale"])
    b1 = f32(sp_params["norm1"]["bias"])
    g2 = f32(sp_params["norm2"]["scale"])
    b2 = f32(sp_params["norm2"]["bias"])
    k1 = sp_params["conv1"]["kernel"][0].astype(dt)
    k2 = sp_params["conv2"]["kernel"][0].astype(dt)
    c1b = f32(sp_params["conv1"]["bias"])
    c2b = f32(sp_params["conv2"]["bias"])
    tg1 = f32(tm_params["norm1"]["scale"])
    tb1 = f32(tm_params["norm1"]["bias"])
    tw1 = tm_params["conv1"]["kernel"][:, 0, 0].astype(dt)   # [3, C, C]
    tb1c = f32(tm_params["conv1"]["bias"])
    tg2 = f32(tm_params["norm2"]["scale"])
    tb2 = f32(tm_params["norm2"]["bias"])
    tw2 = tm_params["conv2"]["kernel"][:, 0, 0].astype(dt)
    tb2c = f32(tm_params["conv2"]["bias"])

    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    hb = h // 2
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps,
                          replicate=(first_pad_mode == "replicate"), r=r),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, c), dt),
        grid=(b, h // r, t),
        in_specs=[
            pl.BlockSpec((1, 1, r, w, c),
                         lambda i, j, k: (i, k, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w, c),
                         lambda i, j, k, _r=r: (
                             i, k, jnp.maximum(j * (_r // 2) - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, w, c),
                         lambda i, j, k, _r=r, _hb=hb: (
                             i, k,
                             jnp.minimum(j * (_r // 2) + _r // 2, _hb - 1),
                             0, 0),
                         memory_space=pltpu.VMEM),
            vfull, vfull, vfull, vfull, vfull, vfull, vfull, vfull,
            vfull, vfull, vfull, vfull, vfull, vfull, vfull, vfull,
        ],
        out_specs=pl.BlockSpec((1, 1, r, w, c),
                               lambda i, j, k: (i, k, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((3, r, w, c), dt),
                        pltpu.VMEM((3, r, w, c), dt)],
        interpret=interpret,
    )(x, x, x, g1, b1, k1, c1b, g2, b2, k2, c2b,
      tg1, tb1, tw1, tb1c, tg2, tb2, tw2, tb2c)
    return out
