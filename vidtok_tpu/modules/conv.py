"""Convolution primitives (channels-last NTHWC, functional causal caches).

All convolutions operate on ``[B, T, H, W, C]`` with weights stored DHWIO
``[kT, kH, kW, Cin, Cout]`` — the native XLA/TPU layout. Spatial-only convs
use kT=1, temporal-only convs use kH=kW=1; everything is a single
``lax.conv_general_dilated`` so XLA fuses pads/elementwise into one op.

Causality model (mirrors reference semantics, redesigned functionally):

* v1.0 (reference model_3dcausal.py:162-197): time axis is left-padded by
  ``time_pad = kT - sT`` frames of **zeros** inside the conv (pad_mode
  'constant' default). The reference computes width padding from the height
  kernel size (model_3dcausal.py:179) — a quirk that is a no-op for the
  square kernels every config uses; we compute it correctly.
* v1.1 (reference model_3dcausal_v1_1.py:144-236): stateful streaming. The
  first chunk left-pads by **replicating frame 0**; later chunks prepend the
  cached tail of the previous (concatenated) input. The reference mutates
  ``causal_cache`` attributes via reflection; here the cache is an explicit
  flax ``'cache'`` variable collection — a pure pytree threaded through
  ``jax.lax.scan`` for streaming inference.
* ``cache_offset`` (reference autoencoder_v1_1.py:212-216, 302-320): during
  overlap-tiled decoding each chunk carries one look-ahead latent; the cache
  must be stored as if the look-ahead frames were never seen. The offset is
  a static per-layer constant derived from the decoder stage graph.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax


def _triple(v) -> Tuple[int, int, int]:
    if isinstance(v, int):
        return (v, v, v)
    t = tuple(v)
    assert len(t) == 3
    return t


# Conv implementation selector. 'direct' lowers one 3D conv through XLA;
# 'decomposed' rewrites every 3D conv as a sum of kT time-shifted 2D convs
# on a (B*T, H, W, C) fold — mathematically identical and measured ~19%
# faster end-to-end on TPU v5e (41.3 -> 49.2 frames/s on the flagship
# 256p model): 2D NHWC convs are the optimized TPU conv path and the T
# axis becomes pure batch. Default; switch with set_conv_impl() or
# VIDTOK_CONV_IMPL=direct.
import os as _os

_CONV_IMPL = _os.environ.get("VIDTOK_CONV_IMPL", "decomposed")


def set_conv_impl(impl: str):
    global _CONV_IMPL
    assert impl in ("direct", "decomposed"), impl
    _CONV_IMPL = impl


def get_conv_impl() -> str:
    return _CONV_IMPL


def _conv2d_frames(x, kernel2d, stride_hw, padding_hw):
    """[B,T,H,W,C] per-frame 2D conv with [kh,kw,I,O] kernel."""
    b, t = x.shape[:2]
    xf = x.reshape((b * t,) + x.shape[2:])
    dn = lax.conv_dimension_numbers(xf.shape, kernel2d.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(xf, kernel2d, stride_hw, padding_hw,
                                 dimension_numbers=dn)
    return y.reshape((b, t) + y.shape[1:])


def conv3d(x, kernel, bias=None, stride=(1, 1, 1), padding="VALID"):
    """NTHWC x DHWIO -> NTHWC convolution (implementation per conv-impl
    switch; both paths are exactly equivalent)."""
    kt = kernel.shape[0]
    st = stride[0]
    kernel = kernel.astype(x.dtype)

    # NOTE: zero-padding narrow input channels (conv_in's RGB) to 8 looked
    # 2.6x faster in isolation (tools/probe_convin.py: 3.95 -> 1.5 ms) but
    # measured SLOWER in the real graph (conv_in 3.59 -> 4.13 ms/clip at
    # B=4) — in context XLA already fuses the 3-channel conv with its
    # surroundings and the explicit pad adds an unfused pass. Not applied.

    if _CONV_IMPL == "decomposed" and padding != "VALID":
        tpad = padding[0]
        if tpad != (0, 0):
            zeros_front = jnp.zeros((x.shape[0], tpad[0]) + x.shape[2:], x.dtype)
            zeros_back = jnp.zeros((x.shape[0], tpad[1]) + x.shape[2:], x.dtype)
            x = jnp.concatenate([zeros_front, x, zeros_back], axis=1)
        t_in = x.shape[1]
        t_out = (t_in - kt) // st + 1

        # (A folded single-2D-conv variant for (kt,1,1) kernels was measured
        # SLOWER on v5e — 45.4 vs 49.1 fps end-to-end — so temporal convs
        # stay on the kt-shifted-matmul path below.)
        pad_hw = [tuple(padding[1]), tuple(padding[2])]

        if kt > 1 and st == 1 and x.shape[-1] * kt <= 32:
            # Narrow-Cin time fold (conv_in's RGB): concatenate the kt
            # time-shifted views on channels and run ONE 2D conv with
            # Cin = kt*ci. The kt-slice path's cost at Cin=3 is dominated
            # by the f32 partial-sum adds/converts BETWEEN the conv calls
            # (T=161 trace: 15.8 of conv_in's 30 ms); the concat here is
            # tiny (3x a 3-channel input) and the single conv lifts the
            # MXU K dim 27 -> 81. Hardware probe: 17.5 -> 8.3 ms at
            # serving scale (bench_artifacts/probe_convin_tfold.log).
            ci = x.shape[-1]
            xt = jnp.concatenate(
                [x[:, j:t_out + j] for j in range(kt)], axis=-1)
            kf = kernel.transpose(1, 2, 0, 3, 4).reshape(
                kernel.shape[1], kernel.shape[2], kt * ci, -1)
            y = _conv2d_frames(xt, kf, (stride[1], stride[2]), pad_hw)
            if bias is not None:
                y = y + bias.astype(y.dtype)
            return y

        y = None
        for j in range(kt):
            xs = lax.slice_in_dim(x, j, j + (t_out - 1) * st + 1, stride=st,
                                  axis=1)
            yj = _conv2d_frames(xs, kernel[j], (stride[1], stride[2]), pad_hw)
            y = yj if y is None else y + yj
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y

    dn = lax.conv_dimension_numbers(x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=stride,
        padding=padding,
        dimension_numbers=dn,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def _kaiming_uniform_init(kt, kh, kw):
    """torch Conv default init: kaiming_uniform(a=sqrt(5)) == U(-b, b) with
    b = 1/sqrt(fan_in); fan_in = Cin*kT*kH*kW. Used so random-weight golden
    tests see comparable scales."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2] * shape[3]
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _bias_uniform_init(fan_in):
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / jnp.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv3d(nn.Module):
    """Plain (non-causal) 3D conv with symmetric zero padding.

    Matches torch ``nn.Conv3d(..., padding=p)`` semantics
    (reference model_3dnoncausal.py uses padding = (k-1)//2).
    """

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: Sequence[int] = (1, 1, 1)
    padding: Sequence[int] = None  # default: (k-1)//2 each dim
    use_bias: bool = True
    zero_init: bool = False  # zero kernel AND bias (reference zero_init)

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = _triple(self.kernel)
        st = _triple(self.stride)
        if self.padding is None:
            pad = ((kt - 1) // 2, (kh - 1) // 2, (kw - 1) // 2)
        else:
            pad = _triple(self.padding)
        cin = x.shape[-1]
        kinit = (nn.initializers.zeros if self.zero_init
                 else _kaiming_uniform_init(kt, kh, kw))
        binit = (nn.initializers.zeros if self.zero_init
                 else _bias_uniform_init(cin * kt * kh * kw))
        w = self.param(
            "kernel", kinit, (kt, kh, kw, cin, self.features), jnp.float32
        )
        b = (
            self.param("bias", binit, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        padding = [(pad[0], pad[0]), (pad[1], pad[1]), (pad[2], pad[2])]
        return conv3d(x, w, b, st, padding)


class CausalConv3d(nn.Module):
    """Causal 3D conv: time left-pad only, symmetric spatial zero pad.

    ``first_pad_mode``:
      * 'zero'      — v1.0 semantics (constant pad at stream start)
      * 'replicate' — v1.1 semantics (repeat frame 0 at stream start)

    Streaming: call with ``streaming=True`` and the flax 'cache' collection
    mutable. ``first_chunk`` (static) selects stream-start padding vs cache.
    ``use_cache_offset`` (static) applies ``cache_offset`` — only meaningful
    in overlap-tiled decode.
    """

    features: int
    kernel: Sequence[int] = (3, 3, 3)
    stride: Sequence[int] = (1, 1, 1)
    first_pad_mode: str = "zero"
    cache_offset: int = 0

    @nn.compact
    def __call__(self, x, *, streaming: bool = False, first_chunk: bool = True,
                 use_cache_offset: bool = False, **_):
        kt, kh, kw = _triple(self.kernel)
        st, sh, sw = _triple(self.stride)
        time_pad = (kt - 1) + (1 - st)
        hp, wp = kh - 1, kw - 1
        cin = x.shape[-1]

        w = self.param(
            "kernel", _kaiming_uniform_init(kt, kh, kw), (kt, kh, kw, cin, self.features), jnp.float32
        )
        b = self.param("bias", _bias_uniform_init(cin * kt * kh * kw), (self.features,), jnp.float32)

        if time_pad > 0:
            if streaming:
                cache = self.variable(
                    "cache",
                    "tpad",
                    lambda: jnp.zeros((x.shape[0], time_pad) + x.shape[2:], x.dtype),
                )
                if first_chunk:
                    front = jnp.repeat(x[:, :1], time_pad, axis=1)
                else:
                    front = cache.value.astype(x.dtype)
                full = jnp.concatenate([front, x], axis=1)
                off = self.cache_offset if use_cache_offset else 0
                L = full.shape[1]
                cache.value = lax.slice_in_dim(full, L - off - time_pad, L - off, axis=1)
                x = full
            else:
                if self.first_pad_mode == "replicate":
                    front = jnp.repeat(x[:, :1], time_pad, axis=1)
                else:
                    front = jnp.zeros((x.shape[0], time_pad) + x.shape[2:], x.dtype)
                x = jnp.concatenate([front, x], axis=1)

        padding = [(0, 0), (hp // 2, hp - hp // 2), (wp // 2, wp - wp // 2)]
        return conv3d(x, w, b, (st, sh, sw), padding)


class CausalConv1d(nn.Module):
    """Temporal-only causal conv, expressed as a (k,1,1) 3D conv on NTHWC.

    Mirrors reference CausalConv1d (model_3dcausal.py:144-159 /
    v1_1:144-178) but never leaves the 5D layout, so no (b h w) c t
    transposes are needed — the kernel is pointwise over H and W.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    first_pad_mode: str = "zero"
    cache_offset: int = 0
    zero_init: bool = False  # zero kernel AND bias (reference zero_init,
    # model_3dcausal.py:460-462: conv2 of the temporal resblock starts as
    # identity)

    @nn.compact
    def __call__(self, x, *, streaming: bool = False, first_chunk: bool = True,
                 use_cache_offset: bool = False, **_):
        k = self.kernel_size
        time_pad = (k - 1) + (1 - self.stride)
        cin = x.shape[-1]
        kinit = (nn.initializers.zeros if self.zero_init
                 else _kaiming_uniform_init(k, 1, 1))
        binit = (nn.initializers.zeros if self.zero_init
                 else _bias_uniform_init(cin * k))
        w = self.param("kernel", kinit, (k, 1, 1, cin, self.features), jnp.float32)
        b = self.param("bias", binit, (self.features,), jnp.float32)

        if time_pad > 0:
            if streaming:
                cache = self.variable(
                    "cache",
                    "tpad",
                    lambda: jnp.zeros((x.shape[0], time_pad) + x.shape[2:], x.dtype),
                )
                if first_chunk:
                    front = jnp.repeat(x[:, :1], time_pad, axis=1)
                else:
                    front = cache.value.astype(x.dtype)
                full = jnp.concatenate([front, x], axis=1)
                off = self.cache_offset if use_cache_offset else 0
                L = full.shape[1]
                cache.value = lax.slice_in_dim(full, L - off - time_pad, L - off, axis=1)
                x = full
            else:
                if self.first_pad_mode == "replicate":
                    front = jnp.repeat(x[:, :1], time_pad, axis=1)
                else:
                    front = jnp.zeros((x.shape[0], time_pad) + x.shape[2:], x.dtype)
                x = jnp.concatenate([front, x], axis=1)

        return conv3d(x, w, b, (self.stride, 1, 1), [(0, 0), (0, 0), (0, 0)])


class SpatialConv(nn.Module):
    """Per-frame 2D conv expressed as a (1,kh,kw) 3D conv on NTHWC.

    Equivalent to the reference's (b t) c h w fold + Conv2d
    (model_3dcausal.py:14-23) without the reshape round-trip.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: Tuple[int, int, int, int] = None  # (top, bottom, left, right)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        cin = x.shape[-1]
        w = self.param("kernel", _kaiming_uniform_init(1, k, k), (1, k, k, cin, self.features), jnp.float32)
        b = (
            self.param("bias", _bias_uniform_init(cin * k * k), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        if self.padding is None:
            p = (k - 1) // 2
            pad = (p, p, p, p)
        else:
            pad = self.padding
        padding = [(0, 0), (pad[0], pad[1]), (pad[2], pad[3])]
        return conv3d(x, w, b, (1, self.stride, self.stride), padding)
