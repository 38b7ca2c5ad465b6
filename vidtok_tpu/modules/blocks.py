"""Residual / attention / resample blocks (NTHWC, one unified codebase).

Covers reference model_3dcausal.py, model_3dcausal_v1_1.py and
model_3dnoncausal.py blocks. Where the reference folds tensors through
``(b t) c h w`` / ``(b h w) c t`` rearranges to reuse 2D/1D torch ops
(model_3dcausal.py:14-23), we stay in the 5D channels-last layout and let
the conv kernel shape (1,k,k) / (k,1,1) express the same computation — XLA
fuses the whole norm->silu->conv chain without any transposes.

Every block accepts streaming kwargs and threads them to causal convs; the
non-causal variants simply ignore them.
"""

from __future__ import annotations

import os as _os
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .conv import CausalConv1d, CausalConv3d, Conv3d, SpatialConv
from .interp import (
    spatial_avg_pool2x,
    spatial_nearest_up2x,
    temporal_avg_pool3_stride2,
    temporal_linear_up2x,
    temporal_nearest_up2x,
)
from .norms import make_norm, silu


def _named_norm(norm_type: str, mode: str, name: str):
    return make_norm(norm_type, mode=mode, name=name)


class ResnetBlockSpatial(nn.Module):
    """Per-frame 2D residual block (reference ResnetBlock,
    model_3dcausal.py:276-337)."""

    out_channels: int
    norm_type: str = "groupnorm"
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, fused: bool = False,
                 **_):
        in_ch = x.shape[-1]
        if (fused and deterministic and self.norm_type == "layernorm"
                and self.dropout == 0.0 and not self.is_initializing()):
            # v2 fused kernel (aligned halo-block operands — unlike the
            # removed round-1 kernel, no unaligned DMA slices). Inference
            # only: pallas_call has no VJP. Falls back on unfit shapes.
            from ..ops.pallas.fused_spatial_v2 import fused_spatial_resblock_v2

            p = self.variables["params"]
            b, t = x.shape[:2]
            y = fused_spatial_resblock_v2(
                x.reshape((b * t,) + x.shape[2:]), p)
            if y is not None:
                return y.reshape((b, t) + y.shape[1:])
        h = _named_norm(self.norm_type, "frame", "norm1")(x)
        h = silu(h)
        h = SpatialConv(self.out_channels, 3, name="conv1")(h)
        h = _named_norm(self.norm_type, "frame", "norm2")(h)
        h = silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = SpatialConv(self.out_channels, 3, name="conv2")(h)
        if in_ch != self.out_channels:
            x = SpatialConv(self.out_channels, 1, name="nin_shortcut")(x)
        return x + h


class ResnetBlockTemporal(nn.Module):
    """Temporal residual block (reference ResnetCausalBlock1D,
    model_3dcausal.py:427-499; non-causal ResnetBlock1D,
    model_3dnoncausal.py:182-248).

    ``conv2`` is zero-initialized so the temporal branch starts as the
    identity (reference zero_init, model_3dcausal.py:460-462).
    """

    out_channels: int
    causal: bool = True
    norm_type: str = "groupnorm"
    dropout: float = 0.0
    first_pad_mode: str = "zero"
    cache_offset: int = 0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, streaming: bool = False,
                 first_chunk: bool = True, use_cache_offset: bool = False,
                 fused: bool = False, **_):
        in_ch = x.shape[-1]
        from ..ops import pallas as pallas_cfg

        if (fused and pallas_cfg.FUSE_TEMPORAL and not streaming
                and self.causal and not self.is_initializing()
                and self.norm_type == "layernorm" and self.dropout == 0.0
                and in_ch == self.out_channels):
            # Pallas fused path (inference): one VMEM-resident pass.
            # Returns None when H*W admits no aligned spatial tile (odd
            # sizes) — fall through to the unfused path in that case.
            from ..ops.pallas.fused_temporal import fused_temporal_resblock

            y = fused_temporal_resblock(
                x, self.variables["params"], self.first_pad_mode)
            if y is not None:
                return y

        if (fused and pallas_cfg.FUSE_TEMPORAL and streaming and self.causal
                and not self.is_initializing()
                and self.norm_type == "layernorm" and self.dropout == 0.0
                and in_ch == self.out_channels):
            # Streaming fused path: the whole chunk step (both ln_silu
            # passes, both causal convs, residual) plus the cache
            # update in one VMEM pass. The scan-stream decode trace
            # (bench_artifacts/trace_scandec_fused.log) put the unfused
            # streaming temporal blocks at ~7x the batch kernel's
            # per-slot cost — they were the single largest line.
            # Cache semantics mirror the unfused CausalConv1d tpad
            # caches exactly (activated input tails, offset-adjusted);
            # the cache VARIABLES live at block scope because only this
            # path creates/consumes them (paths are jit-specialized, so
            # fused and unfused graphs never share a cache pytree).
            from ..ops.pallas.fused_temporal import (
                fused_temporal_resblock_stream, stream_tile)

            off = self.cache_offset if use_cache_offset else 0
            b_, t_, h_, w_, c_ = x.shape
            fit = t_ >= off and stream_tile(t_, h_ * w_, c_) is not None
            # Path latch (advisor r4): the fused path keeps its caches
            # under different names than the unfused CausalConv1d tpad
            # caches, so the per-chunk decision must not flip mid-stream
            # (flax would silently zero-init the other path's cache). A
            # non-first chunk may take the fused path only if the first
            # chunk created its caches; the reverse flip raises below.
            if fit and not first_chunk and not self.has_variable(
                    "cache", "c1_tpad"):
                fit = False
            if fit:
                c1 = self.variable(
                    "cache", "c1_tpad",
                    lambda: jnp.zeros((b_, 2, h_, w_, c_), x.dtype))
                c2 = self.variable(
                    "cache", "c2_tpad",
                    lambda: jnp.zeros((b_, 2, h_, w_, c_), x.dtype))
                y, nc1, nc2 = fused_temporal_resblock_stream(
                    x, self.variables["params"], c1.value.astype(x.dtype),
                    c2.value.astype(x.dtype), first_chunk=first_chunk,
                    offset=off)
                c1.value = nc1
                c2.value = nc2
                return y
        if (streaming and not first_chunk and not self.is_initializing()
                and self.has_variable("cache", "c1_tpad")):
            raise ValueError(
                "ResnetBlockTemporal streaming path flip: the first chunk "
                f"used the fused kernel but this chunk (shape {x.shape}) "
                "does not fit it; keep chunk shapes stream-invariant or "
                "disable the fused streaming path for this stream.")
        stream = dict(streaming=streaming, first_chunk=first_chunk,
                      use_cache_offset=use_cache_offset)

        def tconv(features, k, zero_init, name):
            if self.causal:
                m = CausalConv1d(
                    features, k, first_pad_mode=self.first_pad_mode,
                    cache_offset=self.cache_offset, zero_init=zero_init,
                    name=name)
                return lambda v: m(v, **stream)
            # torch Conv1d(k=3, padding=1) == symmetric time pad
            m = Conv3d(features, (k, 1, 1), padding=((k - 1) // 2, 0, 0),
                       zero_init=zero_init, name=name)
            return lambda v: m(v)

        nmode = "position" if self.causal else "column"
        h = _named_norm(self.norm_type, nmode, "norm1")(x)
        h = silu(h)
        h = tconv(self.out_channels, 3, False, "conv1")(h)
        h = _named_norm(self.norm_type, nmode, "norm2")(h)
        h = silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = tconv(self.out_channels, 3, True, "conv2")(h)
        if in_ch != self.out_channels:
            x = tconv(self.out_channels, 1, False, "nin_shortcut")(x)
        return x + h


class ResnetBlock3D(nn.Module):
    """Full 3D residual block, used only in the mid stack
    (reference ResnetCausalBlock model_3dcausal.py:340-424;
    ResnetNoncausalBlock model_3dnoncausal.py:251-311).

    Causal variant computes norm statistics per-frame (the reference folds T
    into batch before norm); the non-causal variant normalizes over the full
    (T,H,W) extent — this only matters for groupnorm.
    """

    out_channels: int
    causal: bool = True
    norm_type: str = "groupnorm"
    dropout: float = 0.0
    first_pad_mode: str = "zero"
    cache_offset: int = 0

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, streaming: bool = False,
                 first_chunk: bool = True, use_cache_offset: bool = False, **_):
        in_ch = x.shape[-1]
        stream = dict(streaming=streaming, first_chunk=first_chunk,
                      use_cache_offset=use_cache_offset)

        def conv(features, k, name):
            if self.causal:
                m = CausalConv3d(
                    features, (k, k, k), first_pad_mode=self.first_pad_mode,
                    cache_offset=self.cache_offset, name=name)
                return lambda v: m(v, **stream)
            m = Conv3d(features, (k, k, k), name=name)
            return lambda v: m(v)

        nmode = "frame" if self.causal else "video"
        h = _named_norm(self.norm_type, nmode, "norm1")(x)
        h = silu(h)
        h = conv(self.out_channels, 3, "conv1")(h)
        h = _named_norm(self.norm_type, nmode, "norm2")(h)
        h = silu(h)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv(self.out_channels, 3, "conv2")(h)
        if in_ch != self.out_channels:
            x = conv(self.out_channels, 1, "nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Per-frame spatial self-attention, single head over channels
    (reference AttnBlockWrapper, model_3dcausal.py:121-141 /
    model_3dnoncausal.py:17-34). q/k/v/proj are 1x1x1 convs; softmax in fp32;
    scale = C**-0.5 (torch SDPA default)."""

    norm_type: str = "groupnorm"
    causal: bool = True

    @nn.compact
    def __call__(self, x, **_):
        c = x.shape[-1]
        h_ = _named_norm(self.norm_type,
                         "frame" if self.causal else "video", "norm")(x)
        # kernel size 1 => causal and plain conv coincide (time_pad == 0)
        q = Conv3d(c, (1, 1, 1), name="q")(h_)
        k = Conv3d(c, (1, 1, 1), name="k")(h_)
        v = Conv3d(c, (1, 1, 1), name="v")(h_)

        b, t, hh, ww, _ = q.shape
        s = hh * ww
        qf = q.reshape(b, t, s, c).astype(jnp.float32)
        kf = k.reshape(b, t, s, c).astype(jnp.float32)
        vf = v.reshape(b, t, s, c).astype(jnp.float32)
        attn = jnp.einsum("btqc,btkc->btqk", qf, kf) * (c ** -0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("btqk,btkc->btqc", attn, vf).astype(x.dtype)
        out = out.reshape(b, t, hh, ww, c)
        out = Conv3d(c, (1, 1, 1), name="proj_out")(out)
        return x + out


class SpatialDownsample(nn.Module):
    """Per-frame 2x downsample (reference Downsample,
    model_3dcausal.py:215-230): asymmetric (0,1,0,1) zero pad + 3x3 stride-2
    conv, or 2x2 avg-pool."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x, **_):
        if self.with_conv:
            c = x.shape[-1]
            return SpatialConv(c, 3, stride=2, padding=(0, 1, 0, 1), name="conv")(x)
        return spatial_avg_pool2x(x)


class SpatialUpsample(nn.Module):
    """Per-frame 2x nearest upsample + 3x3 conv (reference Upsample,
    model_3dcausal.py:200-212).

    Implemented by subpixel decomposition: because the upsample duplicates
    each pixel 2x2, the 3x3 conv over the upsampled grid is EXACTLY four
    2x2 convs over the original grid (kernel taps grouped by source pixel),
    interleaved by output parity — 2.25x fewer MACs and no 4x-sized
    intermediate tensor. ``subpixel=False`` keeps the naive path (used to
    verify equality in tests)."""

    with_conv: bool = True
    subpixel: bool = True

    @nn.compact
    def __call__(self, x, *, fused: bool = False, deterministic: bool = True,
                 **_):
        if not self.with_conv:
            return spatial_nearest_up2x(x)
        c = x.shape[-1]
        if not self.subpixel:
            x = spatial_nearest_up2x(x)
            return SpatialConv(c, 3, name="conv")(x)

        conv = SpatialConv(c, 3, name="conv")
        if self.is_initializing():
            # create params with the naive path once (same tree)
            return conv(spatial_nearest_up2x(x))
        k = self.variables["params"]["conv"]["kernel"][0]  # [3,3,C,C]
        bias = self.variables["params"]["conv"]["bias"]
        return _subpixel_up2x_conv3x3(x, k, bias,
                                      allow_pallas=fused and deterministic)


def _subpixel_up2x_conv3x3(x, k, bias, allow_pallas=False):
    """Exact nearest-2x-upsample + 3x3 conv via four parity convs.

    x: [B,T,H,W,C]; k: [3,3,Cin,Cout]. Output row 2a+p reads upsampled rows
    2a+p-1..2a+p+1, i.e. source rows {a-1,a} (p=0) or {a,a+1} (p=1) with tap
    weights grouped accordingly; columns likewise."""
    from jax import lax

    dtype = x.dtype
    k = k.astype(dtype)
    # row-combined kernels: [2, 3, Ci, Co]
    r0 = jnp.stack([k[0], k[1] + k[2]])          # parity 0: rows a-1, a
    r1 = jnp.stack([k[0] + k[1], k[2]])          # parity 1: rows a, a+1
    # column-combine each: [2, 2, Ci, Co]
    def colmix(kr):
        return jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1), \
               jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1)

    e00, e01 = colmix(r0)
    e10, e11 = colmix(r1)

    b, t, h, w, cin = x.shape
    xf = x.reshape(b * t, h, w, cin)

    def conv2(xp, kern, pad_r, pad_c):
        dn = lax.conv_dimension_numbers(xf.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(xp, kern, (1, 1), [pad_r, pad_c],
                                        dimension_numbers=dn)

    if allow_pallas and _SUBPIXEL_MERGED:
        # Merged form: ONE once-padded input + ONE VALID 2x2 conv with
        # the four parity kernels on output-channel groups; the epilogue
        # reads each parity at its (row, col) offset in-kernel. Kills 3
        # of the 4 per-conv input layout copies (4 x 2.1 ms at
        # up_1_upsample in the T=161 trace) and runs one 4C-wide conv.
        from ..ops.pallas.subpixel_epilogue import subpixel_interleave_z

        cout = k.shape[-1]
        xp = jnp.pad(xf, ((0, 0), (1, 1), (1, 1), (0, 0)))
        k4 = jnp.concatenate([e00, e01, e10, e11], axis=-1)
        z = conv2(xp, k4, (0, 0), (0, 0))         # [N, H+1, W+1, 4C]
        y = subpixel_interleave_z(z, bias, cout)
        if y is not None:
            return y.reshape(b, t, 2 * h, 2 * w, cout)

    # parity (pr, pc): source window rows start at a-1 (pr=0, pad top) or a
    # (pr=1, pad bottom); same for columns
    y00 = conv2(xf, e00, (1, 0), (1, 0))
    y01 = conv2(xf, e01, (1, 0), (0, 1))
    y10 = conv2(xf, e10, (0, 1), (1, 0))
    y11 = conv2(xf, e11, (0, 1), (0, 1))
    cout = y00.shape[-1]
    if allow_pallas:
        # single-pass interleave+bias tail (inference only — no VJP)
        from ..ops.pallas.subpixel_epilogue import subpixel_interleave

        y = subpixel_interleave(y00, y01, y10, y11, bias)
        if y is not None:
            return y.reshape(b, t, 2 * h, 2 * w, cout)
    # interleave: y[2a+pr, 2b+pc] = y_{pr pc}[a, b]
    rows = jnp.stack([jnp.stack([y00, y01], axis=3),
                      jnp.stack([y10, y11], axis=3)], axis=2)
    # rows: [N, H, 2(pr), W, 2(pc), C]
    y = rows.reshape(b * t, 2 * h, 2 * w, cout) + bias.astype(dtype)
    return y.reshape(b, t, 2 * h, 2 * w, cout)


class TimeDownsampleRes2x(nn.Module):
    """Blended temporal 2x downsample (reference TimeDownsampleResCausal2x,
    model_3dcausal.py:233-252, v1_1:272-302; non-causal TimeDownsampleRes2x,
    model_3dnoncausal.py:70-91).

    alpha = sigmoid(mix_factor);  y = alpha*avgpool3s2(pad(x)) +
    (1-alpha)*conv3d_s2(x).  Padding differs per variant:
      causal v1.0: 1 zero frame front; causal v1.1: replicate front / cache;
      non-causal: 1 zero frame at the END.
    """

    out_channels: int
    causal: bool = True
    first_pad_mode: str = "zero"  # v1.0: zero-front; v1.1 uses replicate
    mix_factor_init: float = 2.0

    @nn.compact
    def __call__(self, x, *, streaming: bool = False, first_chunk: bool = True,
                 use_cache_offset: bool = False, **_):
        mix = self.param("mix_factor", nn.initializers.constant(self.mix_factor_init),
                         (1,), jnp.float32)
        alpha = nn.sigmoid(mix).astype(x.dtype)

        if not self.causal:
            zeros = jnp.zeros_like(x[:, :1])
            x_pad = jnp.concatenate([x, zeros], axis=1)
            x1 = temporal_avg_pool3_stride2(x_pad)
            x2 = Conv3d(self.out_channels, (3, 3, 3), stride=(2, 1, 1),
                        padding=(0, 1, 1), name="conv")(x_pad)
            return alpha * x1 + (1 - alpha) * x2

        if streaming:
            cache = self.variable(
                "cache", "pool",
                lambda: jnp.zeros((x.shape[0], 1) + x.shape[2:], x.dtype))
            if first_chunk:
                front = x[:, :1] if self.first_pad_mode == "replicate" else jnp.zeros_like(x[:, :1])
            else:
                front = cache.value.astype(x.dtype)
            x_pad = jnp.concatenate([front, x], axis=1)
            cache.value = x_pad[:, -1:]
        else:
            front = x[:, :1] if self.first_pad_mode == "replicate" else jnp.zeros_like(x[:, :1])
            x_pad = jnp.concatenate([front, x], axis=1)

        x1 = temporal_avg_pool3_stride2(x_pad)
        x2 = CausalConv3d(self.out_channels, (3, 3, 3), stride=(2, 1, 1),
                          first_pad_mode=self.first_pad_mode, name="conv")(
            x, streaming=streaming, first_chunk=first_chunk,
            use_cache_offset=use_cache_offset)
        return alpha * x1 + (1 - alpha) * x2


class TimeUpsampleRes2x(nn.Module):
    """Blended temporal 2x upsample (reference TimeUpsampleResCausal2x,
    model_3dcausal.py:255-273, v1_1:305-343; non-causal,
    model_3dnoncausal.py:93-115).

    interpolation_mode 'nearest' (v1.0/non-causal) or 'trilinear' (v1.1,
    stream-cached: carries ``num_temp_upsample`` trailing frames so chunked
    and single-shot decoding agree exactly)."""

    out_channels: int
    causal: bool = True
    interpolation_mode: str = "nearest"
    num_temp_upsample: int = 1
    first_pad_mode: str = "zero"
    cache_offset: int = 0
    mix_factor_init: float = 2.0
    # False when the module is wrapped in nn.remat (the remat'd call path
    # uses default kwargs, and the Pallas parity tail has no VJP)
    pallas_ok: bool = True

    @nn.compact
    def __call__(self, x, *, streaming: bool = False, first_chunk: bool = True,
                 use_cache_offset: bool = False, deterministic: bool = True,
                 **_):
        mix = self.param("mix_factor", nn.initializers.constant(self.mix_factor_init),
                         (1,), jnp.float32)
        alpha = nn.sigmoid(mix).astype(x.dtype)
        ntu = self.num_temp_upsample

        if (_PARITY_UPSAMPLE and self.interpolation_mode == "nearest"
                and self.causal and streaming
                and not self.is_initializing()
                and x.shape[-1] == self.out_channels
                and (self.cache_offset % 2 == 0 if use_cache_offset
                     else True)):
            # Streaming parity fast path. The unfused streaming step
            # nearest-upsamples the chunk and runs CausalConv3d with a
            # 2-U-frame cache; in half-rate (parity) terms that cache is
            # exactly ONE source frame (U[2b] == U[2b+1] == s[b], and the
            # even cache offsets the decoder derives keep the pair
            # aligned). Prepending that frame to the chunk and dropping
            # the first output pair reproduces the unfused chunk outputs
            # EXACTLY while reusing the batch parity kernels unchanged —
            # the scan-stream decode trace put the unfused streaming
            # upsamples at ~3x the batch parity kernel's per-slot cost.
            off_s = (self.cache_offset // 2) if use_cache_offset else 0
            b_, t_, h_, w_, c_ = x.shape
            fit = t_ >= max(off_s, 1)
            # Path latch (advisor r4): see ResnetBlockTemporal — the parity
            # cache ('sprev') and the unfused caches ('tpad') must not mix
            # mid-stream.
            if fit and not first_chunk and not self.has_variable(
                    "cache", "sprev"):
                fit = False
            if fit:
                cache = self.variable(
                    "cache", "sprev",
                    lambda: jnp.zeros((b_, 1, h_, w_, c_), x.dtype))
                front = (x[:, :1] if first_chunk
                         else cache.value.astype(x.dtype))
                s_ext = jnp.concatenate([front, x], axis=1)
                # s_ext index i == source-stream index i-1 relative to the
                # chunk; the unfused cache slice [L-off-2, L-off) lands on
                # source index t-1-off_s, i.e. s_ext[t-off_s] (the front
                # frame itself when the offset reaches the boundary).
                cache.value = s_ext[:, t_ - off_s: t_ - off_s + 1]
                k = self.variables["params"]["conv"]["kernel"]
                b = self.variables["params"]["conv"]["bias"]
                y = _parity_up2x_conv_blend(s_ext, k, b, alpha,
                                            self.first_pad_mode,
                                            allow_pallas=deterministic)
                return y[:, 2:]
        if (streaming and not first_chunk and not self.is_initializing()
                and self.has_variable("cache", "sprev")):
            raise ValueError(
                "TimeUpsampleRes2x streaming path flip: the first chunk "
                f"used the parity fast path but this chunk (shape {x.shape})"
                " does not fit it; keep chunk shapes stream-invariant.")

        if (_PARITY_UPSAMPLE and self.interpolation_mode == "nearest"
                and self.causal and not streaming
                and not self.is_initializing()
                and x.shape[-1] == self.out_channels):
            # Channel-packed parity fast path: never materializes the 2x
            # upsampled tensor; 1.5x fewer conv MACs (see the helper's
            # docstring). Profiled: the two upsample convs are 29% of
            # decoder device time at 79% MXU, so the MAC cut is the win.
            # The Pallas tail has no VJP — inference (deterministic) only.
            k = self.variables["params"]["conv"]["kernel"]
            b = self.variables["params"]["conv"]["bias"]
            return _parity_up2x_conv_blend(
                x, k, b, alpha, self.first_pad_mode,
                allow_pallas=deterministic and self.pallas_ok)

        if self.interpolation_mode == "nearest":
            x = temporal_nearest_up2x(x)
        else:
            if streaming:
                cache = self.variable(
                    "cache", "interp",
                    lambda: jnp.zeros((x.shape[0], ntu) + x.shape[2:], x.dtype))
                if first_chunk:
                    cache.value = x[:, -ntu:]
                    head, tail = x[:, :ntu], x[:, ntu:]
                    head = temporal_linear_up2x(head)
                    if tail.shape[1] > 0:
                        x = jnp.concatenate([head, temporal_linear_up2x(tail)], axis=1)
                    else:
                        x = head
                else:
                    xc = jnp.concatenate([cache.value.astype(x.dtype), x], axis=1)
                    cache.value = xc[:, -2 * ntu : -ntu]
                    x = temporal_linear_up2x(xc)[:, 2 * ntu :]
            else:
                # single-shot v1.1: first-chunk path (split at ntu)
                head, tail = x[:, :ntu], x[:, ntu:]
                head = temporal_linear_up2x(head)
                if tail.shape[1] > 0:
                    x = jnp.concatenate([head, temporal_linear_up2x(tail)], axis=1)
                else:
                    x = head

        if self.causal:
            conv = CausalConv3d(self.out_channels, (3, 3, 3),
                                first_pad_mode=self.first_pad_mode,
                                cache_offset=self.cache_offset, name="conv")
            x_ = conv(x, streaming=streaming, first_chunk=first_chunk,
                      use_cache_offset=use_cache_offset)
        else:
            x_ = Conv3d(self.out_channels, (3, 3, 3), name="conv")(x)
        return alpha * x + (1 - alpha) * x_


# Parity fast path for the nearest-mode blended temporal upsample. Default
# on (exact; covered by the golden parity tests). VIDTOK_PARITY_UPSAMPLE=0
# to disable. Variant history (all microbenched on v5e, level-1 shapes —
# tools/microbench_upsample.py): two-phase convs + jnp.stack interleave
# 59.3 fps e2e (interleave copies ate the MAC cut); channel-packed single
# [3,3,2C,2C] conv 60.0 ms isolated; TWO C->2C convs + output-shift add
# 58.0 ms isolated (no concat copy, keeps the narrow conv's higher MXU
# efficiency) — the shipped form below.
_PARITY_UPSAMPLE = _os.environ.get("VIDTOK_PARITY_UPSAMPLE", "1") == "1"
# Pallas blend+interleave tail for the parity upsample (exact; fp32
# accumulate). VIDTOK_PARITY_EPILOGUE=0 falls back to the XLA tail.
_PARITY_EPILOGUE = _os.environ.get("VIDTOK_PARITY_EPILOGUE", "1") == "1"
# Merge the two C->2C parity convs into ONE C->4C conv (one conv input
# layout copy instead of two). Exact; A/B-gated.
_PARITY_MERGED = _os.environ.get("VIDTOK_PARITY_MERGED", "1") == "1"
# Merge the four subpixel parity convs into ONE VALID 2x2 conv on a
# once-padded input (epilogue reads parity offsets in-kernel). Exact,
# but measured NEUTRAL-to-slightly-negative end-to-end (152.29 ->
# 151.86 fps, bench_subpixm.log vs bench_r32_t201.log — the 4C-wide z
# write plus in-kernel sublane-offset reads cost what the 3 saved
# input copies bought). Default OFF; probe-selectable.
_SUBPIXEL_MERGED = _os.environ.get("VIDTOK_SUBPIXEL_MERGED", "0") == "1"


def _parity_up2x_conv_blend(s, k, bias, alpha, first_pad_mode,
                            allow_pallas=True):
    """Full TimeUpsampleRes2x 'nearest' step — ``alpha * up2x(s) +
    (1-alpha) * causal_conv333(up2x(s))`` — computed from the HALF-RATE
    frames by output parity, with 2/3 the MACs and no 2x intermediate.

    With U[2a] = U[2a+1] = s[a] and causal time pad 2:
      y[2a]   reads U[2a-2..2a]   = s[a-1], s[a-1], s[a] -> (K0+K1)s[a-1] + K2 s[a]
      y[2a+1] reads U[2a-1..2a+1] = s[a-1], s[a],   s[a] -> K0 s[a-1] + (K1+K2)s[a]
    (Kj = the [3,3,C,C] spatial taps of the causal kernel; s[-1] is the
    stream-start pad: zeros for v1.0, frame 0 for v1.1 — reference
    model_3dcausal.py:255-273 semantics, restated for the half-rate input.)

    Both parities of output frame a are linear in (s[a-1], s[a]), so run TWO
    per-frame C->2C convs on s — one with the "current-frame" taps, one with
    the "previous-frame" taps — and add the prev-tap result shifted one
    frame later. Each is a plain NHWC 2D conv (the optimal TPU conv shape);
    keeping them C->2C rather than concatenating to one 2C->2C conv avoids
    the input-concat copy and runs at higher MXU efficiency (156 vs 119
    TFLOP/s measured). The residual blend runs on the packed
    [B,T,H,W,2,C] layout; one transpose interleaves parity into time.
    """
    from .conv import _conv2d_frames

    b_, t, h, w, c = s.shape
    dt = s.dtype
    if allow_pallas:
        # fully-fused form: 3 base convs + blend + interleave in one
        # kernel, 25% fewer MACs and no conv-input layout copy
        # (ops/pallas/parity_upsample_fused.py)
        from ..ops.pallas.parity_upsample_fused import parity_up2x_fused

        out = parity_up2x_fused(s, k, bias, alpha, first_pad_mode)
        if out is not None:
            return out
    k = k.astype(dt)  # [3, 3, 3, C, C]
    k_prev = jnp.concatenate([k[0] + k[1], k[0]], axis=-1)  # [3,3,C,2C]
    k_cur = jnp.concatenate([k[2], k[1] + k[2]], axis=-1)
    if _PARITY_MERGED and _PARITY_EPILOGUE and allow_pallas:
        # Single C->4C conv [cur-taps | prev-taps]: one conv input layout
        # copy instead of two (profiled 2x ~2.6 ms at level 1); the Pallas
        # tail picks the halves at frames t / t-1.
        from ..ops.pallas.upsample_epilogue import parity_blend_interleave4

        y4 = _conv2d_frames(s, jnp.concatenate([k_cur, k_prev], axis=-1),
                            (1, 1), [(1, 1), (1, 1)])
        out = parity_blend_interleave4(s, y4, bias, alpha, first_pad_mode)
        if out is not None:
            return out
        y_cur, y_prev = y4[..., :2 * c], y4[..., 2 * c:]
    else:
        y_cur = _conv2d_frames(s, k_cur, (1, 1), [(1, 1), (1, 1)])
        y_prev = _conv2d_frames(s, k_prev, (1, 1), [(1, 1), (1, 1)])
    if _PARITY_EPILOGUE and allow_pallas:
        # One-pass Pallas tail: shift-add + bias + blend + parity
        # interleave without materializing the packed intermediate
        # (~-9 ms at decoder level 1; see ops/pallas/upsample_epilogue.py).
        from ..ops.pallas.upsample_epilogue import parity_blend_interleave

        out = parity_blend_interleave(s, y_cur, y_prev, bias, alpha,
                                      first_pad_mode)
        if out is not None:
            return out
    if first_pad_mode == "replicate":
        front = y_prev[:, :1]
    else:
        front = jnp.zeros_like(y_prev[:, :1])
    y_prev = jnp.concatenate([front, y_prev[:, :-1]], axis=1)
    yc = (y_cur + y_prev).reshape(b_, t, h, w, 2, c) + bias.astype(y_cur.dtype)
    y = alpha * s[:, :, :, :, None, :] + (1 - alpha) * yc.astype(dt)
    return jnp.transpose(y, (0, 1, 4, 2, 3, 5)).reshape(b_, 2 * t, h, w, c)
