"""Pallas TPU kernel: fused per-frame spatial residual block (layernorm).

Replaces the whole ResnetBlockSpatial body (reference ResnetBlock,
model_3dcausal.py:276-337, layernorm variant)

    out = shortcut(x) + conv2(silu(ln2(conv1(silu(ln1(x))))))

with ONE VMEM-resident pass per row tile. At B=4 flagship decode the XLA
chain spends ~half its time in norm-stat reductions, converts, adds and
conv layout copies (profiled: up_0_block_0 16.4 ms/clip of which ~9 ms is
non-conv); fusing keeps every intermediate in VMEM so HBM sees only one
read of x and one write of out.

Why this succeeds where the round-1 fused kernel (removed) failed: that
kernel DMA'd unaligned halo slices, forcing Mosaic relayouts. Here the
3x3 halos come from *aligned block operands* — the row dimension is
covered by a main (1,R,W,C) block plus two 2-row halo blocks whose
index_maps address 2-row-aligned positions (R even), so every DMA is a
whole aligned block; only static W-shifts (sublane moves) happen
in-kernel. Both convs run as 9 tap matmuls (M=rows*W, K=Cin, N=C —
full-lane MXU shapes), f32 accumulation, layernorm stats per position in
f32 (ChannelLayerNorm semantics, norms.py).

Dtype contract matches the unfused path op-for-op: ln stats f32 ->
cast to x.dtype -> silu in x.dtype -> conv (f32 accumulate, cast) ->
bias in x.dtype.

Inference-only (pallas_call has no VJP); callers gate on determinism.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtok_tpu.ops.pallas import act, tuning


def _ln_silu(xa, g, b, eps):
    dt = xa.dtype
    xf = xa.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) / jnp.sqrt(var + eps)
    y = y * g.astype(jnp.float32) + b.astype(jnp.float32)
    # silu on the dt-rounded value, but in f32 lanes: Mosaic's bf16
    # logistic path trips a verifier bug (f32->bf16 vector.broadcast)
    yf = y.astype(dt).astype(jnp.float32)
    return (yf * jax.lax.logistic(yf)).astype(dt)


def _conv3x3(h, k, bias, pre_shift=True, center_only=False, kpack=False):
    """h: [rows, W, Ci] -> [rows-2, W, Co]; k: [3,3,Ci,Co] (h's dtype),
    SAME W-padding, VALID rows (halo rows consumed).

    ``pre_shift=True`` materializes the two W-shifted copies of h ONCE and
    feeds every tap matmul an aligned leading-dim slice; the padded-slice
    form (False) hands Mosaic 6 sublane-offset operands per conv (dw=1,2
    slices of the W+2 pad), each a vreg relayout — profiled at 46-60% MXU
    on the flagship spatial stages, which this variant targets.

    ``kpack=True`` (implies pre_shift) lane-concatenates the three
    W-shifted copies into one [rows, W, 3Ci] operand so each dr row-tap is
    ONE K=3Ci matmul: 9 MXU issues + 9 f32 acc read-modify-writes become
    3, trading a lane-aligned VMEM concat (the copies already exist) for
    deeper-K MXU passes.
    """
    rows, w, ci = h.shape
    co = k.shape[-1]
    out_rows = rows - 2
    acc = jnp.zeros((out_rows * w, co), jnp.float32)
    if center_only:  # probe-only ablation: 3 center-column taps, no copies
        for dr in range(3):
            xs = h[dr:dr + out_rows].reshape(out_rows * w, ci)
            acc += jax.lax.dot_general(
                xs, k[dr, 1], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    elif kpack:
        z = jnp.zeros((rows, 1, ci), h.dtype)
        hcat = jnp.concatenate(
            [jnp.concatenate([z, h[:, :w - 1]], axis=1), h,
             jnp.concatenate([h[:, 1:], z], axis=1)], axis=-1)
        # k[dr] is [dw, Ci, Co]; reshape rows dw-major to match hcat's
        # (dw-block, ci) channel order.
        for dr in range(3):
            xs = hcat[dr:dr + out_rows].reshape(out_rows * w, 3 * ci)
            acc += jax.lax.dot_general(
                xs, k[dr].reshape(3 * ci, co), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    elif pre_shift:
        z = jnp.zeros((rows, 1, ci), h.dtype)
        srcs = (jnp.concatenate([z, h[:, :w - 1]], axis=1), h,
                jnp.concatenate([h[:, 1:], z], axis=1))
        for dr in range(3):
            for dw in range(3):
                xs = srcs[dw][dr:dr + out_rows].reshape(out_rows * w, ci)
                acc += jax.lax.dot_general(
                    xs, k[dr, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    else:
        hp = jnp.pad(h, ((0, 0), (1, 1), (0, 0)))
        for dr in range(3):
            for dw in range(3):
                xs = hp[dr:dr + out_rows, dw:dw + w, :].reshape(
                    out_rows * w, ci)
                acc += jax.lax.dot_general(
                    xs, k[dr, dw], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    return (acc.reshape(out_rows, w, co).astype(h.dtype)
            + bias.astype(h.dtype))


def _kernel(xm_ref, xt_ref, xb_ref, g1_ref, b1_ref, k1_ref, c1b_ref,
            g2_ref, b2_ref, k2_ref, c2b_ref, nk_ref, nb_ref, out_ref, *,
            eps, has_nin, pre_shift=True, silu_fast=False, ablate="",
            kpack=False):
    # ``ablate`` (probe-only, wrong numerics): 'noln' skips norm+silu,
    # 'noshift' uses center-tap-only convs (3 matmuls, no W copies),
    # 'noedge' skips the frame-edge kill masks. Used by
    # tools/probe_spatial_attrib.py to attribute non-matmul overhead.
    ln = act.impl(silu_fast, _ln_silu)
    if "noln" in ablate:
        ln = lambda xa, g, b, e: xa
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    xm = xm_ref[0]                     # [R, W, Cin]
    top = xt_ref[0]                    # [2, W, Cin]
    bot = xb_ref[0]
    # spatial zero-pad at frame edges (the clamped halo blocks hold
    # in-frame rows there; the conv's SAME padding wants zeros)
    top = jnp.where(j == 0, jnp.zeros_like(top), top)
    bot = jnp.where(j == nj - 1, jnp.zeros_like(bot), bot)
    xa = jnp.concatenate([top, xm, bot], axis=0)   # [R+4, W, Cin]

    h1 = ln(xa, g1_ref[:], b1_ref[:], eps)
    # conv1's SAME padding is zeros AFTER norm+silu — at frame edges the
    # halo rows were zero INPUT, and ln_silu(0) = silu(bias) != 0 when the
    # norm bias is nonzero; kill the activated phantom rows.
    ra = h1.shape[0]
    aidx = jax.lax.broadcasted_iota(jnp.int32, (ra, 1, 1), 0)
    akill = jnp.logical_or(jnp.logical_and(j == 0, aidx < 2),
                           jnp.logical_and(j == nj - 1, aidx >= ra - 2))
    if "noedge" not in ablate:
        h1 = jnp.where(akill, jnp.zeros_like(h1), h1)
    c1 = _conv3x3(h1, k1_ref[:], c1b_ref[:], pre_shift,
                  center_only="noshift" in ablate, kpack=kpack)  # [R+2,W,C]
    h2 = ln(c1, g2_ref[:], b2_ref[:], eps)
    # conv2's SAME padding must tap ZERO beyond the frame — at frame
    # edges h2's halo row is a phantom (conv1-of-zeros + bias, normed),
    # not conv2's zero pad; kill it.
    rr = h2.shape[0]
    ridx = jax.lax.broadcasted_iota(jnp.int32, (rr, 1, 1), 0)
    kill = jnp.logical_or(jnp.logical_and(j == 0, ridx == 0),
                          jnp.logical_and(j == nj - 1, ridx == rr - 1))
    if "noedge" not in ablate:
        h2 = jnp.where(kill, jnp.zeros_like(h2), h2)
    c2 = _conv3x3(h2, k2_ref[:], c2b_ref[:], pre_shift,
                  center_only="noshift" in ablate, kpack=kpack)  # [R, W, C]

    if has_nin:
        r, w, ci = xm.shape
        co = nk_ref.shape[-1]
        sc = jax.lax.dot_general(
            xm.reshape(r * w, ci), nk_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        sc = (sc.reshape(r, w, co).astype(xm.dtype)
              + nb_ref[:].astype(xm.dtype))
    else:
        sc = xm
    out_ref[0] = sc + c2


import os as _os

_TILE_OVERRIDE = int(_os.environ.get("VIDTOK_SPATIAL_TILE", "0"))
_KPACK = _os.environ.get("VIDTOK_SPATIAL_KPACK", "0") == "1"


def fused_spatial_resblock_v2(x, params, *, eps: float = 1e-6,
                              row_tile: int = 0, interpret=None,
                              pre_shift: bool = True,
                              silu_fast: bool = None, ablate: str = "",
                              kpack: bool = None):
    """x: [N, H, W, Cin] (batch*frames folded) -> [N, H, W, C] or None.

    ``params``: the flax param tree of ResnetBlockSpatial (norm1/conv1/
    norm2/conv2 [+ nin_shortcut]). Returns None when the shape doesn't fit
    the kernel's tiling (caller falls back to the XLA path).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h, w, cin = x.shape
    k1 = params["conv1"]["kernel"]                 # [1,3,3,Cin,C]
    c = k1.shape[-1]
    # default tile: 16 rows when the working set is narrow enough
    # (halo rows are recomputed, so bigger tiles waste fewer FLOPs);
    # 8 keeps wider blocks inside the 16 MB VMEM scoped limit (128ch x
    # W=256 at r=16 measured 17.5 MB -> OOM, hence the 16384 cutoff).
    # VIDTOK_VMEM_LIMIT_MB raises Mosaic's limit (tuning.py); the r=16
    # working-set cutoff scales with it.
    # Row-tile sweep on hardware (bench_artifacts/probe_rtile.log, N=20):
    # c128@256p 7.57/6.94/6.75 ms at r=8/16/32 (halo ln_silu recompute is
    # (r+4)/r + (r+2)/r, so bigger tiles amortize it) — but nin256 and
    # c256@128p measured WORSE at r=32 (11.54 vs 10.51 / 5.44 vs 4.92;
    # wider channels blow the sweet spot). r=32 only for the measured-win
    # equal-128-channel family.
    r = row_tile or _TILE_OVERRIDE or (
        32 if (cin == c == 128 and w == 256 and h % 32 == 0 and h >= 64
               and tuning.budget_scale() >= 4)
        else 16 if max(cin, c) * w <= 16384 * tuning.budget_scale() else 8)
    if r % 2 or h % r or h < r + 2:
        return None
    if not interpret and (w % 16 or cin % 128 or c % 128):
        return None  # sub-lane-width channels: XLA path is fine there
    # The r/w/c working set above is calibrated for 2-byte elements
    # (bf16 serving, hardware-proven); wider dtypes double it past the
    # 16 MB scoped-VMEM limit at the big stages — same failure class as
    # the f32 parity-upsample OOM. Halve the row tile for 4-byte inputs
    # and bail when even r=4 leaves an oversized weight+halo set.
    if not interpret and jnp.dtype(x.dtype).itemsize > 2:
        r = max(4, r // 2)
        if h % r or ((cin + c) * (w + 2) * (r + 2) * 4
                     > (12 << 20) * tuning.budget_scale()):
            return None
    has_nin = "nin_shortcut" in params
    dt = x.dtype

    g1 = params["norm1"]["scale"].astype(jnp.float32)
    b1 = params["norm1"]["bias"].astype(jnp.float32)
    g2 = params["norm2"]["scale"].astype(jnp.float32)
    b2 = params["norm2"]["bias"].astype(jnp.float32)
    k1d = k1[0].astype(dt)                          # [3,3,Cin,C]
    k2d = params["conv2"]["kernel"][0].astype(dt)
    c1b = params["conv1"]["bias"].astype(jnp.float32)
    c2b = params["conv2"]["bias"].astype(jnp.float32)
    if has_nin:
        nk = params["nin_shortcut"]["kernel"][0, 0, 0].astype(dt)  # [Cin,C]
        nb = params["nin_shortcut"]["bias"].astype(jnp.float32)
    else:  # dummies keep the operand list static
        nk = jnp.zeros((1, 1), dt)
        nb = jnp.zeros((1,), jnp.float32)

    vfull = pl.BlockSpec(memory_space=pltpu.VMEM)
    hb = h // 2  # row dim as 2-row blocks for the halo operands
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, has_nin=has_nin,
                          pre_shift=pre_shift,
                          silu_fast=act.resolve(silu_fast), ablate=ablate,
                          kpack=_KPACK if kpack is None else kpack),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dt),
        grid=(n, h // r),
        in_specs=[
            pl.BlockSpec((1, r, w, cin), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            # top halo rows [jr-2, jr): 2-row block index jr/2 - 1
            pl.BlockSpec((1, 2, w, cin),
                         lambda i, j, _r=r: (
                             i, jnp.maximum(j * (_r // 2) - 1, 0), 0, 0),
                         memory_space=pltpu.VMEM),
            # bottom halo rows [jr+r, jr+r+2): block index jr/2 + r/2
            pl.BlockSpec((1, 2, w, cin),
                         lambda i, j, _r=r, _hb=hb: (
                             i, jnp.minimum(j * (_r // 2) + _r // 2, _hb - 1),
                             0, 0),
                         memory_space=pltpu.VMEM),
            vfull, vfull, vfull, vfull, vfull, vfull, vfull, vfull,
            vfull, vfull,
        ],
        out_specs=pl.BlockSpec((1, r, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(x, x, x, g1, b1, k1d, c1b, g2, b2, k2d, c2b, nk, nb)
    return out
