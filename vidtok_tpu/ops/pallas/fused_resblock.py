"""Pallas TPU kernel: fused per-frame spatial residual block.

Computes, in one VMEM-resident pass per (frame, row-tile):

    y = x + conv2(silu(ln2(conv1(silu(ln1(x)))))) [+ 1x1 shortcut when
                                                    C_in != C_out]

which is ``ResnetBlockSpatial`` with layernorm (the shipped configs'
norm_type). The unfused XLA path materializes ~8-10 full activation maps in
HBM per block; this kernel reads x once and writes y once — the
bandwidth-bound levels 0/1 of the VAE are exactly where that matters.

Layout: x is the (B*T)-folded frame batch [N, H, W, C]; weights are the
block's params (ln scales/biases fp32, conv kernels [1,3,3,Cin,Cout]). The
host pads H by 2 and W by 1 per side (zeros — torch Conv2d padding) so each
row-tile DMAs its haloed slice from HBM with a plain dynamic slice; the 3x3
convs run as 9 shifted [rows*W, Cin] @ [Cin, Cout] MXU matmuls accumulated
in fp32.

Grid: (N, H/TILE_H). VMEM per program (worst case C=128, W=256, TILE_H=8):
~5 MB. Group-norm configs fall back to the unfused module path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_silu(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * scale + bias
    return y * jax.nn.sigmoid(y)


import os as _os

# 'slice' (default): offset slices (force Mosaic relayouts but always
# compile). 'roll' expresses shifts as pltpu.roll + aligned slices — faster
# in principle but Mosaic cannot rotate non-32-bit vectors (bf16), so it is
# only usable for fp32 runs.
_SHIFT_IMPL = _os.environ.get("VIDTOK_FUSE_SPATIAL_SHIFT", "slice")


def _conv3x3(act, w, th_out, width):
    """act: [rows, W_pad, Cin] (borders pre-zeroed) -> [th_out, W, Cout]
    via 9 MXU matmuls."""
    cin = act.shape[-1]
    cout = w.shape[-1]
    acc = jnp.zeros((th_out * width, cout), jnp.float32)
    for dr in range(3):
        for dw in range(3):
            if _SHIFT_IMPL == "roll":
                shifted = act
                if dr:  # left-roll by dr == right-roll by (size - dr)
                    shifted = pltpu.roll(shifted, act.shape[0] - dr, 0)
                if dw:
                    shifted = pltpu.roll(shifted, act.shape[1] - dw, 1)
                a = shifted[:th_out, :width, :]
            else:
                a = act[dr:dr + th_out, dw:dw + width, :]
            a = a.reshape(th_out * width, cin)
            acc = acc + jnp.dot(a, w[dr, dw],
                                preferred_element_type=jnp.float32)
    return acc.reshape(th_out, width, cout)


def _kernel(x_hbm, ln1_s, ln1_b, w1, b1, ln2_s, ln2_b, w2, b2, ws, bs,
            out_ref, x_tile, sem, *, tile_h, width, height, has_shortcut):
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = j * tile_h

    copy = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(row0, tile_h + 4)], x_tile, sem)
    copy.start()
    copy.wait()

    x = x_tile[:]
    dtype = x.dtype
    cin = x.shape[-1]

    res = x[2:2 + tile_h, 1:1 + width, :]

    # LN1+SiLU over the haloed tile. Conv zero-padding applies AFTER the
    # activation in the unfused graph, so halo positions that fall outside
    # the true frame must be zeroed (LN+SiLU of a zero row is silu(bias)!=0).
    a1 = _ln_silu(x, ln1_s[:], ln1_b[:]).astype(dtype)
    # 3D iotas: Mosaic cannot insert a minor dim on i1 vectors
    rows1 = jax.lax.broadcasted_iota(jnp.int32, a1.shape, 0) + row0 - 2
    cols1 = jax.lax.broadcasted_iota(jnp.int32, a1.shape, 1)
    valid1 = ((rows1 >= 0) & (rows1 < height)
              & (cols1 >= 1) & (cols1 <= width))
    a1 = jnp.where(valid1, a1, jnp.zeros_like(a1))
    h = _conv3x3(a1, w1[:], tile_h + 2, width) + b1[:]

    # LN2+SiLU; rows of h outside the true frame likewise become zeros
    a2 = _ln_silu(h, ln2_s[:], ln2_b[:]).astype(dtype)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, a2.shape, 0) + row0 - 1
    valid2 = (rows2 >= 0) & (rows2 < height)
    a2 = jnp.where(valid2, a2, jnp.zeros_like(a2))
    a2p = jnp.pad(a2, ((0, 0), (1, 1), (0, 0)))
    y = _conv3x3(a2p, w2[:], tile_h, width) + b2[:]

    if has_shortcut:
        rs = jnp.dot(res.reshape(tile_h * width, cin), ws[:],
                     preferred_element_type=jnp.float32)
        res = rs.reshape(tile_h, width, -1) + bs[:]
    else:
        res = res.astype(jnp.float32)

    out_ref[0] = (res + y).astype(dtype)


def fused_spatial_resblock(x, params, tile_h: int = 8,
                           interpret: bool = None):
    """x: [N, H, W, Cin] -> [N, H, W, Cout] (ResnetBlockSpatial, layernorm).

    params: the flax param subtree of one ResnetBlockSpatial
    ({'norm1': {scale,bias}, 'conv1': {kernel [1,3,3,Cin,Cmid], bias},
      'norm2', 'conv2', optional 'nin_shortcut'}).

    ``interpret`` defaults to True on CPU backends (testing) and False on
    TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h, w, cin = x.shape
    k1 = params["conv1"]["kernel"]
    k2 = params["conv2"]["kernel"]
    cout = k2.shape[-1]
    has_shortcut = "nin_shortcut" in params
    while h % tile_h != 0 and tile_h > 1:
        tile_h //= 2

    # pad W so the DMA'd tile's sublane dim is 8-aligned (Mosaic tiling)
    wpad_total = -(-(w + 2) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (2, 2), (1, wpad_total - w - 1), (0, 0)))
    dtype = x.dtype
    ws = (params["nin_shortcut"]["kernel"][0, 0, 0].astype(dtype)
          if has_shortcut else jnp.zeros((cin, cout), dtype))
    bs = (params["nin_shortcut"]["bias"].astype(jnp.float32)
          if has_shortcut else jnp.zeros((cout,), jnp.float32))

    kern = functools.partial(_kernel, tile_h=tile_h, width=w, height=h,
                             has_shortcut=has_shortcut)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dtype),
        grid=(n, h // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]
        + [vspec] * 10,
        out_specs=pl.BlockSpec((1, tile_h, w, cout),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 4, wpad_total, cin), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        xp,
        params["norm1"]["scale"].astype(jnp.float32),
        params["norm1"]["bias"].astype(jnp.float32),
        k1[0].astype(dtype), params["conv1"]["bias"].astype(jnp.float32),
        params["norm2"]["scale"].astype(jnp.float32),
        params["norm2"]["bias"].astype(jnp.float32),
        k2[0].astype(dtype), params["conv2"]["bias"].astype(jnp.float32),
        ws, bs,
    )
    return out
