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

from vidtok_tpu.ops.pallas import act, tuning

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


def _kernel_tap_pack(xm_ref, xt_ref, xb_ref, g_ref, b_ref, kp_ref, bias_ref,
                     mask_ref, out_ref, ring_ref, *, eps, replicate, r,
                     stage2="vpu", silu_fast=False):
    """Tap-packed variant: the narrow RGB output starves the MXU at N=8
    (6% lane utilization, 27 issues/step). Packing the 9 spatial taps x 8
    padded channels onto the N dim runs ONE [rows*W, C] @ [C, 72] matmul
    per time tap (56% lane util), stores the 72-lane partials in the ring
    (each frame's product under all 3 time-tap weights, since future steps
    read it at a different tap position), and combines taps with 9 shifted
    lane-group reads — MXU row-passes drop 27*M -> 3*M per step.

    ``stage2``: 'vpu' = lane-slice + shifted adds in f32 (exact);
    'mm' = one-hot extraction matmuls in the tile dtype (bf16 rounding of
    the per-time-tap partials; covered by the end-to-end parity gate).
    """
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
    ln = act.impl(silu_fast, _ln_silu)
    h = ln(xa, g_ref[:], b_ref[:], eps)
    ra = h.shape[0]
    aidx = jax.lax.broadcasted_iota(jnp.int32, (ra, 1, 1), 0)
    akill = jnp.logical_or(jnp.logical_and(j == 0, aidx == 0),
                           jnp.logical_and(j == nj - 1, aidx == ra - 1))
    h = jnp.where(akill, jnp.zeros_like(h), h)
    w = xm.shape[1]
    c = xm.shape[2]

    # stage 1: y72[i, j, (dr*3+dw)*8+co] = sum_c h[i,j,c] * K[t, dr, dw, c, co]
    # one matmul per step; kp_ref[tap]: [C, 72]
    # The ring slot for frame t must hold THIS frame's product under the
    # frame-t weight for each FUTURE tap position; the causal conv weight
    # differs per time tap, so store all 3 tap-products: [3, R+2, W, 72].
    hm = h.reshape(ra * w, c)
    for tap in range(3):
        ring_ref[t % 3, tap] = jax.lax.dot_general(
            hm, kp_ref[tap], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(
                ra, w, kp_ref.shape[-1])

    # stage 2: acc72 = sum over time taps of the ring partials, then
    # combine the 9 spatial tap groups with (row, W) shifts.
    acc72 = jnp.zeros((ra, w, kp_ref.shape[-1]), jnp.float32)
    for tap in range(3):
        src = t - 2 + tap
        part = ring_ref[jnp.maximum(src, 0) % 3, tap]
        if replicate:
            acc72 += part
        else:
            acc72 += jnp.where(src >= 0, part, jnp.zeros_like(part))

    nl = acc72.shape[-1]                       # 128 lanes (16 groups of 8)
    if stage2 == "mm":
        xb16 = acc72.astype(xm.dtype)
        acc = jnp.zeros((r * w, _PAD_CO), jnp.float32)
        for dr in range(3):
            for dw in range(3):
                xs = xb16[dr:dr + r]
                if dw == 0:
                    xs = jnp.concatenate(
                        [jnp.zeros((r, 1, nl), xs.dtype), xs[:, :w - 1]], 1)
                elif dw == 2:
                    xs = jnp.concatenate(
                        [xs[:, 1:], jnp.zeros((r, 1, nl), xs.dtype)], 1)
                acc += jax.lax.dot_general(
                    xs.reshape(r * w, nl), mask_ref[dr * 3 + dw],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        acc = acc.reshape(r, w, _PAD_CO)
    else:
        # full-lane masked adds (no narrow lane slices — Mosaic's
        # concatenate rejects offset-mismatched 8-lane vectors), then ONE
        # all-groups extraction matmul (the lane-split reshape-sum trips
        # Mosaic's infer-vector-layout)
        accf = jnp.zeros((r, w, nl), jnp.float32)
        for dr in range(3):
            for dw in range(3):
                xs = acc72[dr:dr + r]
                if dw == 0:
                    xs = jnp.concatenate(
                        [jnp.zeros((r, 1, nl), xs.dtype), xs[:, :w - 1]], 1)
                elif dw == 2:
                    xs = jnp.concatenate(
                        [xs[:, 1:], jnp.zeros((r, 1, nl), xs.dtype)], 1)
                accf += xs * jnp.sum(mask_ref[dr * 3 + dw].astype(
                    jnp.float32), axis=1)
        allg = jnp.sum(mask_ref[...], axis=0)          # [nl, 8] group sum
        acc = jax.lax.dot_general(
            accf.reshape(r * w, nl).astype(xm.dtype), allg,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(r, w, _PAD_CO)

    acc += bias_ref[:].astype(jnp.float32)
    out_ref[0, 0] = acc.astype(xm.dtype)


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


import os as _os

# default ON since round 4: hardware probe (bench_artifacts/
# probe_tail_pack3.log) measured 9.12 -> 3.25 ms per 20 slots (2.8x) for
# the vpu-combine variant at the flagship tail shape; VIDTOK_TAIL_TAP_PACK
# = '0' restores the 27-matmul kernel, 'mm' selects the matmul combine
# (probed slower: 4.89 ms).
_TAP_PACK = _os.environ.get("VIDTOK_TAIL_TAP_PACK", "1")


def tail_fits(h, w, c, co, kernel_shape, row_tile: int = 8,
              interpret=None) -> bool:
    """Shape-fitness predicate for decoder_tail_rgb: True iff the kernel
    will run (callers use this BEFORE creating streaming cache variables,
    so an unfit shape never leaves a dead cache entry — advisor r4)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    r = row_tile
    while h % r and r > 2:
        r //= 2
    if co > _PAD_CO or tuple(kernel_shape[:3]) != (3, 3, 3) or h % r or h < r:
        return False
    if not interpret and (w % 128 or c % 128):
        return False
    return True


def decoder_tail_rgb(x, norm_params, conv_params, first_pad_mode,
                     *, eps: float = 1e-6, row_tile: int = 8,
                     interpret=None, pre_shift: bool = True,
                     tap_pack=None, stage2: str = "vpu",
                     silu_fast=None):
    """x: [B, T, H, W, C] -> [B, T, H, W, Cout] or None (unfit shapes).

    ``norm_params``: ChannelLayerNorm {scale, bias}; ``conv_params``:
    CausalConv3d {kernel [3,3,3,C,Cout], bias [Cout]} with Cout <= 8.

    ``tap_pack`` selects the N-packed kernel variant (see
    _kernel_tap_pack); default from VIDTOK_TAIL_TAP_PACK ('0' off,
    '1' vpu combine, 'mm' one-hot-matmul combine).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if tap_pack is None:
        tap_pack = _TAP_PACK != "0"
        if _TAP_PACK == "mm":
            stage2 = "mm"
    b, t, h, w, c = x.shape
    km = conv_params["kernel"]
    co = km.shape[-1]
    if not tail_fits(h, w, c, co, km.shape, row_tile, interpret):
        return None
    r = row_tile
    while h % r and r > 2:
        r //= 2
    dt = x.dtype

    g = norm_params["scale"].astype(jnp.float32)
    bb = norm_params["bias"].astype(jnp.float32)
    km8 = jnp.pad(km.astype(dt), ((0, 0),) * 4 + ((0, _PAD_CO - co),))
    bias8 = jnp.pad(conv_params["bias"].astype(jnp.float32),
                    (0, _PAD_CO - co))

    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    extra = []
    if tap_pack:
        # [3(kt),3(dr),3(dw),C,8] -> per-tap [C, (dr*3+dw)*8+co], padded to
        # full 128 lanes so every stage-2 shift/concat is a natural-layout
        # full-vreg op (72-lane vectors trip Mosaic concat offset checks)
        nl = 128
        kp = jnp.pad(km8.transpose(0, 3, 1, 2, 4).reshape(3, c, 72),
                     ((0, 0), (0, 0), (0, nl - 72)))
        kern = functools.partial(
            _kernel_tap_pack, eps=eps,
            replicate=(first_pad_mode == "replicate"), r=r, stage2=stage2,
            silu_fast=act.resolve(silu_fast))
        ring = pltpu.VMEM((3, 3, r + 2, w, nl), jnp.float32)
        kw = kp
        import numpy as np
        masks = np.zeros((9, nl, 8), np.float32)
        for tp in range(9):
            masks[tp, tp * 8:tp * 8 + 8] = np.eye(8)
        extra = [jnp.asarray(masks, dt)]
    else:
        kern = functools.partial(
            _kernel, eps=eps, replicate=(first_pad_mode == "replicate"),
            r=r, pre_shift=pre_shift)
        ring = pltpu.VMEM((3, 3, r + 2, w, c) if pre_shift
                          else (3, 1, r + 2, w + 2, c), dt)
        kw = km8
    out = pl.pallas_call(
        kern,
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
        ] + [vfull] * len(extra),
        out_specs=pl.BlockSpec((1, 1, r, w, _PAD_CO),
                               lambda i, j, k: (i, k, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[ring],
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(x, x, x, g, bb, kw, bias8, *extra)
    return out[..., :co]
