"""Pallas TPU kernel: subpixel-upsample interleave epilogue.

``SpatialUpsample`` computes nearest-2x-up + 3x3 conv as four parity convs
(modules/blocks.py _subpixel_up2x_conv3x3). The XLA tail that interleaves
the four [N,H,W,C] parity outputs into [N,2H,2W,C] (stack + reshape) costs
several full-tensor copy passes (~6 ms/clip across decoder levels at B=4).

This kernel writes ``out5[N, H, 2, 2W, C]`` — the ROW parity lives in its
own dimension, so the final [N,2H,2W,C] view is a free leading-dim reshape
in XLA; only the column interleave (a half-tile sublane shuffle) happens
in-kernel. A first version that interleaved rows in-kernel blew the 16 MB
VMEM scoped limit (34.5 MB of relayout scratch for the row+column mixed
reshape).

    out[2a+pr, 2b+pc, :] = y[pr][pc][a, b, :] + bias
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vidtok_tpu.ops.pallas import tuning


def _kernel(y00_ref, y01_ref, y10_ref, y11_ref, bias_ref, out_ref):
    y00 = y00_ref[0]
    y01 = y01_ref[0]
    y10 = y10_ref[0]
    y11 = y11_ref[0]
    r, w, c = y00.shape
    bias = bias_ref[:].astype(y00.dtype)
    # column interleave per row-parity: [R, W, 2(pc), C] -> [R, 2W, C]
    even = jnp.stack([y00, y01], axis=2).reshape(r, 2 * w, c) + bias
    odd = jnp.stack([y10, y11], axis=2).reshape(r, 2 * w, c) + bias
    out_ref[0] = jnp.stack([even, odd], axis=1)       # [R, 2(pr), 2W, C]


def _kernel_z(zm_ref, zn_ref, bias_ref, out_ref, *, c):
    zm = zm_ref[0]                    # [R, W+1, 4C]
    zn = zn_ref[0]                    # [1, W+1, 4C] (row block jR+R)
    r = zm.shape[0]
    w = zm.shape[1] - 1
    za = jnp.concatenate([zm[1:], zn], axis=0)        # rows jR+1 .. jR+R
    bias = bias_ref[:].astype(zm.dtype)
    y00 = zm[:, :w, 0 * c:1 * c]
    y01 = zm[:, 1:, 1 * c:2 * c]
    y10 = za[:, :w, 2 * c:3 * c]
    y11 = za[:, 1:, 3 * c:4 * c]
    even = jnp.stack([y00, y01], axis=2).reshape(r, 2 * w, c) + bias
    odd = jnp.stack([y10, y11], axis=2).reshape(r, 2 * w, c) + bias
    out_ref[0] = jnp.stack([even, odd], axis=1)       # [R, 2(pr), 2W, C]


def subpixel_interleave_z(z, bias, c, *, row_tile: int = 4, interpret=None):
    """Merged-conv form: ``z [N, H+1, W+1, 4C]`` is ONE VALID 2x2 conv of
    the once-padded input with the four parity kernels on output-channel
    groups (order e00|e01|e10|e11); this epilogue reads each parity at
    its (row, col) offset in-kernel — one conv input layout copy instead
    of four (T=161 trace: 4 x 2.1 ms copies at up_1_upsample alone).

    Returns [N, 2H, 2W, C] or None (unfit shapes)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h1, w1, c4 = z.shape
    h, w = h1 - 1, w1 - 1
    if c4 != 4 * c:
        return None
    r = row_tile
    while h % r and r > 1:
        r //= 2
    if h % r:
        return None
    if not interpret and (w % 16 or c % 128):
        return None

    zspec = pl.BlockSpec((1, r, w1, c4), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    # 1-row halo at row jR+R (exists: z has H+1 rows; max jR+R = H)
    nspec = pl.BlockSpec((1, 1, w1, c4), lambda i, j, _r=r: (i, j * _r + _r,
                                                             0, 0),
                         memory_space=pltpu.VMEM)
    import functools
    out5 = pl.pallas_call(
        functools.partial(_kernel_z, c=c),
        out_shape=jax.ShapeDtypeStruct((n, h, 2, 2 * w, c), z.dtype),
        grid=(n, h // r),
        in_specs=[zspec, nspec, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 2, 2 * w, c),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(z, z, bias.astype(z.dtype))
    return out5.reshape(n, 2 * h, 2 * w, c)


def subpixel_interleave(y00, y01, y10, y11, bias, *, row_tile: int = 4,
                        interpret=None):
    """y_pq: [N, H, W, C] parity conv outputs -> [N, 2H, 2W, C] or None."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, h, w, c = y00.shape
    r = row_tile
    while h % r and r > 1:
        r //= 2
    if h % r:
        return None
    if not interpret and (w % 16 or c % 128):
        return None

    spec = pl.BlockSpec((1, r, w, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    out5 = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, 2, 2 * w, c), y00.dtype),
        grid=(n, h // r),
        in_specs=[spec, spec, spec, spec,
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, r, 2, 2 * w, c),
                               lambda i, j: (i, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=tuning.mosaic_params(),
        interpret=interpret,
    )(y00, y01, y10, y11, bias.astype(y00.dtype))
    return out5.reshape(n, 2 * h, 2 * w, c)   # free: merges (H, 2) rows
