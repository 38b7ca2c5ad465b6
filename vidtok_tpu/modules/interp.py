"""Resize / pooling primitives on NTHWC, fp32 internals.

Semantics match torch ``F.interpolate`` as used by the reference:
 * nearest 2x (spatial, reference model_3dcausal.py:209; temporal, :269)
   == exact duplication (floor index mapping).
 * trilinear [2,1,1] with align_corners=False (reference
   model_3dcausal_v1_1.py:328-339) == 1D linear along T with edge clamp;
   H/W scale 1.0 is the identity.

The reference upcasts to fp32 around every interpolate; we do the same for
the linear path (nearest is a pure gather — dtype preserved).
"""

from __future__ import annotations

import jax.numpy as jnp


def spatial_nearest_up2x(x):
    """[B,T,H,W,C] -> [B,T,2H,2W,C] by duplication."""
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, 2 * h, 2 * w, c)


def temporal_nearest_up2x(x):
    """[B,T,H,W,C] -> [B,2T,H,W,C] by duplication."""
    b, t = x.shape[:2]
    x = jnp.broadcast_to(x[:, :, None], (b, t, 2) + x.shape[2:])
    return x.reshape((b, 2 * t) + x.shape[3:])


def temporal_linear_up2x(x):
    """1D linear 2x upsampling along T, align_corners=False, edge clamp.

    out[2i]   = 0.25*in[i-1] + 0.75*in[i]
    out[2i+1] = 0.75*in[i]   + 0.25*in[i+1]
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    prev = jnp.concatenate([xf[:, :1], xf[:, :-1]], axis=1)
    nxt = jnp.concatenate([xf[:, 1:], xf[:, -1:]], axis=1)
    even = 0.25 * prev + 0.75 * xf
    odd = 0.75 * xf + 0.25 * nxt
    b, t = x.shape[:2]
    out = jnp.stack([even, odd], axis=2).reshape((b, 2 * t) + x.shape[2:])
    return out.astype(dtype)


def temporal_avg_pool3_stride2(x):
    """AvgPool over a 3-frame window, temporal stride 2, VALID padding.

    Matches torch ``nn.AvgPool3d((3,1,1), stride=(2,1,1))``
    (reference model_3dcausal.py:242). Caller applies any front/back pad.
    """
    t = x.shape[1]
    n_out = (t - 3) // 2 + 1
    a = x[:, 0 : 2 * n_out - 1 : 2]
    b = x[:, 1 : 2 * n_out : 2]
    c = x[:, 2 : 2 * n_out + 1 : 2]
    return (a + b + c) / jnp.asarray(3.0, x.dtype)


def spatial_avg_pool2x(x):
    """2x2 average pooling per frame (reference Downsample without conv)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // 2, 2, w // 2, 2, c)
    return x.mean(axis=(3, 5))
