"""Video decoder — one module covering all three reference variants.

Reference: DecoderCausal3D(Padding) (model_3dcausal.py:692-885), v1.1
(model_3dcausal_v1_1.py:763-959), Decoder3D (model_3dnoncausal.py:485-651).

Mirror of the encoder: conv_in -> mid (3D resblock / attn / 3D resblock) ->
levels from deepest to shallowest, each (num_res_blocks+1) x [spatial +
temporal resblock], spatial 2x upsample at ``spatial_us`` levels, temporal
2x upsample additionally at ``tempo_us`` levels -> norm/SiLU/conv_out.

v1.0 drops the first (tdf-1) output frames (model_3dcausal.py:873-885);
v1.1 returns everything and the engine crops (autoencoder_v1_1.py:333-342).

Cache offsets for overlap-tiled streaming decode (reference
autoencoder_v1_1.py:302-320) are derived statically here: walking the decode
order with ``cur = 1``, every causal conv before a temporal upsample gets
offset ``cur``; each temporal upsample's internal conv gets ``2*cur`` (it
runs on already-upsampled frames) and doubles ``cur``; conv_out ends with
``cur == time_downsample_factor``. The offsets are baked as static module
attributes and activated by the ``use_cache_offset`` call flag.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .blocks import (
    AttnBlock,
    ResnetBlock3D,
    ResnetBlockSpatial,
    ResnetBlockTemporal,
    SpatialUpsample,
    TimeUpsampleRes2x,
    _named_norm,
)
from .conv import CausalConv3d, Conv3d
from .norms import silu


class Decoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    out_ch: int = 3
    z_channels: int = 4
    spatial_us: Optional[Sequence[int]] = None
    tempo_us: Optional[Sequence[int]] = None
    variant: str = "causal"  # causal | causal_v1_1 | noncausal
    norm_type: str = "groupnorm"
    dropout: float = 0.0
    time_downsample_factor: int = 4
    interpolation_mode: str = "nearest"  # v1.1 configs: trilinear
    tanh_out: bool = False
    use_checkpoint: bool = False

    @property
    def causal(self) -> bool:
        return self.variant != "noncausal"

    @property
    def first_pad_mode(self) -> str:
        return "replicate" if self.variant == "causal_v1_1" else "zero"

    def _spatial_us(self) -> Tuple[int, ...]:
        n = len(self.ch_mult)
        if self.variant == "noncausal":
            return tuple(range(1, n))
        if self.spatial_us is None:
            return tuple(range(1, n))
        return tuple(self.spatial_us)

    def _tempo_us(self) -> Tuple[int, ...]:
        if self.tempo_us is None:
            return (1, 2)
        return tuple(self.tempo_us)

    def stage_offsets(self):
        """Static per-stage cache offsets (see module docstring).

        Returns (mid_offset, level_offsets, upsample_offsets, out_offset):
        level_offsets[i] applies to the temporal resblocks of level i,
        upsample_offsets[i] to the internal conv of level i's temporal
        upsample.
        """
        n = len(self.ch_mult)
        tempo_us = self._tempo_us()
        cur = 1
        level_offsets = {}
        upsample_offsets = {}
        for i_level in reversed(range(n)):
            level_offsets[i_level] = cur
            if i_level in tempo_us:
                upsample_offsets[i_level] = 2 * cur
                cur *= 2
        return 1, level_offsets, upsample_offsets, cur

    @nn.compact
    def __call__(self, z, *, streaming: bool = False, first_chunk: bool = True,
                 deterministic: bool = True, use_cache_offset: bool = False,
                 return_features: bool = False, fused: bool = False):
        """z: [B, T', H', W', Cz] -> x: [B, T, H, W, out_ch].

        ``return_features=True`` additionally returns the pre-conv_out
        activations (after norm_out+SiLU) — used by the adaptive GAN weight,
        which needs gradients w.r.t. the last-layer kernel only (reference
        losses.py:137-148)."""
        causal = self.causal
        n = len(self.ch_mult)
        spatial_us = self._spatial_us()
        tempo_us = self._tempo_us()
        mid_off, level_offs, up_offs, out_off = self.stage_offsets()

        def stream(offset):
            return dict(streaming=streaming, first_chunk=first_chunk,
                        use_cache_offset=use_cache_offset, fused=fused)

        remat_on = self.use_checkpoint and not streaming
        if remat_on:
            assert self.dropout == 0.0, "use_checkpoint requires dropout=0"
        sp_cls = nn.remat(ResnetBlockSpatial) if remat_on else ResnetBlockSpatial
        tm_cls = nn.remat(ResnetBlockTemporal) if remat_on else ResnetBlockTemporal
        # remat the mid/attn/upsample stages too: the 256p train-step HBM
        # dump put 0.5-1.3 GB of temporaries inside the (previously
        # unrematted) upsample blocks alone. nn.remat is name-transparent,
        # so checkpoints/goldens are unaffected; remat'd calls use default
        # kwargs (non-streaming, deterministic — dropout is asserted 0).
        mid_cls = nn.remat(ResnetBlock3D) if remat_on else ResnetBlock3D
        attn_cls = nn.remat(AttnBlock) if remat_on else AttnBlock
        # upsample stages: remat only on the TRAINING forward (remat'd
        # calls can't thread deterministic, and inference must stay
        # byte-identical to the unrematted model — incl. the Pallas
        # parity tail, which has no VJP and is disabled under remat)
        aux_remat = remat_on and not deterministic
        sup_cls = nn.remat(SpatialUpsample) if aux_remat else SpatialUpsample
        tup_cls = (nn.remat(TimeUpsampleRes2x) if aux_remat
                   else TimeUpsampleRes2x)

        def call(mod, h, off):
            if remat_on:
                return mod(h)
            return mod(h, deterministic=deterministic, **stream(off))

        block_in = self.ch * self.ch_mult[n - 1]
        if causal:
            h = CausalConv3d(block_in, (3, 3, 3), first_pad_mode=self.first_pad_mode,
                             cache_offset=mid_off, name="conv_in")(z, **stream(mid_off))
        else:
            h = Conv3d(block_in, (3, 3, 3), name="conv_in")(z)

        h = call(mid_cls(
            block_in, causal=causal, norm_type=self.norm_type, dropout=self.dropout,
            first_pad_mode=self.first_pad_mode, cache_offset=mid_off,
            name="mid_block_1"), h, mid_off)
        h = attn_cls(norm_type=self.norm_type, causal=causal,
                     name="mid_attn_1")(h)
        h = call(mid_cls(
            block_in, causal=causal, norm_type=self.norm_type, dropout=self.dropout,
            first_pad_mode=self.first_pad_mode, cache_offset=mid_off,
            name="mid_block_2"), h, mid_off)

        # v1.1 trilinear upsample: num_temp_upsample doubles per temporal
        # upsample encountered in decode order (model_3dcausal_v1_1.py:856-881)

        ntu = 1
        for i_level in reversed(range(n)):
            block_out = self.ch * self.ch_mult[i_level]
            off = level_offs[i_level]
            for i_block in range(self.num_res_blocks + 1):
                sp_name = f"up_{i_level}_block_{i_block}"
                tm_name = f"up_temporal_{i_level}_block_{i_block}"
                h = call(sp_cls(
                    block_out, norm_type=self.norm_type, dropout=self.dropout,
                    name=sp_name), h, off)
                h = call(tm_cls(
                    block_out, causal=causal, norm_type=self.norm_type,
                    dropout=self.dropout, first_pad_mode=self.first_pad_mode,
                    cache_offset=off,
                    name=tm_name), h, off)
            if i_level in spatial_us:
                if aux_remat:
                    h = sup_cls(name=f"up_{i_level}_upsample")(h)
                else:
                    h = SpatialUpsample(name=f"up_{i_level}_upsample")(
                        h, fused=fused, deterministic=deterministic)
                if i_level in tempo_us:
                    tup = tup_cls(
                        h.shape[-1], causal=causal,
                        interpolation_mode=self.interpolation_mode
                        if self.variant == "causal_v1_1" else "nearest",
                        num_temp_upsample=ntu,
                        first_pad_mode=self.first_pad_mode,
                        cache_offset=up_offs[i_level],
                        pallas_ok=not aux_remat,
                        name=f"up_temporal_{i_level}_upsample")
                    if aux_remat:
                        h = tup(h)
                    else:
                        h = tup(h, deterministic=deterministic,
                                **stream(up_offs[i_level]))
                    ntu *= 2

        if (fused and deterministic and streaming and not return_features
                and causal and self.norm_type == "layernorm"
                and not self.is_initializing()):
            # Streaming decoder tail: cache the last two RAW pre-norm
            # frames (their ln_silu activations are per-position, hence
            # recomputable in-kernel), prepend them to the chunk, and run
            # the batch tail kernel in replicate mode — frames 0/1 of its
            # output correspond to the cached warmup taps and are
            # dropped. Exactly reproduces the unfused conv_out streaming
            # cache semantics (activated-input tails, offset-adjusted).
            from ..ops.pallas.decoder_tail import decoder_tail_rgb, tail_fits

            off = out_off if use_cache_offset else 0
            b_, t_, h_, w_, c_ = h.shape
            p = self.variables["params"]
            # fitness BEFORE creating the cache variable, so unfit shapes
            # never leave a dead zero cache entry (advisor r4); latch the
            # path across chunks like the other streaming fast paths.
            fit = t_ >= off and tail_fits(
                h_, w_, c_, p["conv_out"]["kernel"].shape[-1],
                p["conv_out"]["kernel"].shape)
            if fit and not first_chunk and not self.has_variable(
                    "cache", "tail_h"):
                fit = False
            if fit:
                cache = self.variable(
                    "cache", "tail_h",
                    lambda: jnp.zeros((b_, 2, h_, w_, c_), h.dtype))
                front = (jnp.concatenate([h[:, :1]] * 2, axis=1)
                         if first_chunk else cache.value.astype(h.dtype))
                h_ext = jnp.concatenate([front, h], axis=1)
                y = decoder_tail_rgb(h_ext, p["norm_out"],
                                     {"kernel": p["conv_out"]["kernel"],
                                      "bias": p["conv_out"]["bias"]},
                                     "replicate")
                # unfused cache = activated full[L-off-2 : L-off] with
                # L = t+2; in raw ext indices that is [t-off, t-off+2)
                cache.value = h_ext[:, t_ - off: t_ - off + 2]
                y = y[:, 2:]
                if self.tanh_out:
                    y = jnp.tanh(y)
                if self.variant == "causal":
                    # v1.0 per-chunk warmup crop (same as the unfused
                    # streaming exit below)
                    y = y[:, self.time_downsample_factor - 1:]
                return y
        if (streaming and not first_chunk and not self.is_initializing()
                and self.has_variable("cache", "tail_h")):
            raise ValueError(
                "Decoder streaming tail path flip: the first chunk used the "
                f"fused tail kernel but this chunk (shape {h.shape}) does "
                "not fit it; keep chunk shapes stream-invariant.")

        if (fused and deterministic and not streaming and not return_features
                and causal and self.norm_type == "layernorm"
                and not self.is_initializing()):
            # One-pass Pallas tail: layernorm+silu+causal conv_out with a
            # VMEM time-ring (ops/pallas/decoder_tail.py). Inference only;
            # return_features (adaptive GAN weight) keeps the XLA path.
            from ..ops.pallas.decoder_tail import decoder_tail_rgb

            p = self.variables["params"]
            y = decoder_tail_rgb(h, p["norm_out"],
                                 {"kernel": p["conv_out"]["kernel"],
                                  "bias": p["conv_out"]["bias"]},
                                 self.first_pad_mode)
            if y is not None:
                if self.tanh_out:
                    y = jnp.tanh(y)
                if self.variant == "causal":
                    y = y[:, self.time_downsample_factor - 1:]
                return y

        h = _named_norm(self.norm_type, "frame" if causal else "video",
                        "norm_out")(h)
        h = silu(h)
        pre = h
        if causal:
            h = CausalConv3d(self.out_ch, (3, 3, 3), first_pad_mode=self.first_pad_mode,
                             cache_offset=out_off, name="conv_out")(h, **stream(out_off))
        else:
            h = Conv3d(self.out_ch, (3, 3, 3), name="conv_out")(h)

        if self.tanh_out:
            h = jnp.tanh(h)

        if self.variant == "causal":
            # v1.0 drops the first tdf-1 frames (model_3dcausal.py:873-885)
            h = h[:, self.time_downsample_factor - 1 :]
        if return_features:
            return h, pre
        return h

    def apply_conv_out(self, conv_out_params, pre):
        """Re-apply only the final conv to pre-features (non-streaming path).

        Linear in the kernel — the closure the adaptive GAN weight
        differentiates (reference losses.py:137-148)."""
        from .conv import conv3d as _conv3d

        kernel = conv_out_params["kernel"]
        bias = conv_out_params["bias"]
        if self.causal:
            if self.first_pad_mode == "replicate":
                front = jnp.repeat(pre[:, :1], 2, axis=1)
            else:
                front = jnp.zeros_like(pre[:, :2])
            x = jnp.concatenate([front, pre], axis=1)
            h = _conv3d(x, kernel, bias, (1, 1, 1),
                        [(0, 0), (1, 1), (1, 1)])
        else:
            h = _conv3d(pre, kernel, bias, (1, 1, 1),
                        [(1, 1), (1, 1), (1, 1)])
        if self.tanh_out:
            h = jnp.tanh(h)
        if self.variant == "causal":
            h = h[:, self.time_downsample_factor - 1 :]
        return h
