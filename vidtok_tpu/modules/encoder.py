"""Video encoder — one module covering all three reference variants.

Reference: EncoderCausal3D(Padding) (model_3dcausal.py:502-689), v1.1
(model_3dcausal_v1_1.py:572-760), Encoder3D (model_3dnoncausal.py:314-482).

Topology per level: num_res_blocks x [per-frame spatial resblock +
temporal resblock], spatial 2x downsample at levels in ``spatial_ds``,
temporal 2x downsample additionally at levels in ``tempo_ds``; then a
3D-resblock / spatial-attention / 3D-resblock mid stack; then norm+SiLU+
conv_out (2*z_channels if double_z).

``variant``:
  * 'causal'      — v1.0: interior convs zero-pad the stream start; input
                    front-padded by tdf-1 replicate frames when
                    T % tdf != 0 (model_3dcausal.py:674-689).
  * 'causal_v1_1' — v1.1: interior convs replicate-pad (or consume stream
                    cache); input padded to a multiple of tdf
                    (model_3dcausal_v1_1.py:744-760).
  * 'noncausal'   — symmetric padding everywhere; spatial downsample at all
                    but the last level (model_3dnoncausal.py:314-482).
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
    SpatialDownsample,
    TimeDownsampleRes2x,
)
from .conv import CausalConv3d, Conv3d
from .norms import make_norm, silu


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    in_channels: int = 3
    z_channels: int = 4
    double_z: bool = True
    spatial_ds: Optional[Sequence[int]] = None
    tempo_ds: Optional[Sequence[int]] = None
    variant: str = "causal"  # causal | causal_v1_1 | noncausal
    norm_type: str = "groupnorm"
    dropout: float = 0.0
    time_downsample_factor: int = 4
    init_pad_mode: str = "replicate"
    use_checkpoint: bool = False

    @property
    def causal(self) -> bool:
        return self.variant != "noncausal"

    @property
    def first_pad_mode(self) -> str:
        return "replicate" if self.variant == "causal_v1_1" else "zero"

    def _spatial_ds(self) -> Tuple[int, ...]:
        n = len(self.ch_mult)
        if self.variant == "noncausal":
            return tuple(range(n - 1))
        if self.spatial_ds is None:
            return tuple(range(n - 1))
        return tuple(self.spatial_ds)

    def _tempo_ds(self) -> Tuple[int, ...]:
        n = len(self.ch_mult)
        if self.tempo_ds is None:
            return (n - 2, n - 3)
        return tuple(self.tempo_ds)

    def pad_input(self, x):
        """Front-pad time so the causal stream length is tdf-aligned.

        v1.0: pad a fixed tdf-1 frames whenever T % tdf != 0
        (model_3dcausal.py:685-689). v1.1: pad exactly to the next multiple
        (model_3dcausal_v1_1.py:755-760). ``init_pad_mode`` replicate/constant.
        """
        if not self.causal:
            return x
        t = x.shape[1]
        tdf = self.time_downsample_factor
        if t % tdf == 0:
            return x
        if self.variant == "causal_v1_1":
            pad = tdf - t % tdf
        else:
            pad = tdf - 1
        if self.init_pad_mode == "replicate":
            front = jnp.repeat(x[:, :1], pad, axis=1)
        else:
            front = jnp.zeros((x.shape[0], pad) + x.shape[2:], x.dtype)
        return jnp.concatenate([front, x], axis=1)

    @nn.compact
    def __call__(self, x, *, streaming: bool = False, first_chunk: bool = True,
                 deterministic: bool = True, fused: bool = False):
        """x: [B, T, H, W, C] -> z-params: [B, T', H', W', Cz].

        ``fused=True`` routes spatial resblocks through the Pallas fused
        kernel (inference fast path)."""
        stream = dict(streaming=streaming, first_chunk=first_chunk,
                      fused=fused)
        causal = self.causal
        n = len(self.ch_mult)
        spatial_ds = self._spatial_ds()
        tempo_ds = self._tempo_ds()

        if not streaming:
            x = self.pad_input(x)

        # activation checkpointing: remat each residual block (reference
        # use_checkpoint flag, util.py:89-143). Only on the non-streaming
        # path (caches are incompatible with remat) and dropout==0 (remat'd
        # calls run with default flags).
        remat_on = self.use_checkpoint and not streaming
        if remat_on:
            assert self.dropout == 0.0, "use_checkpoint requires dropout=0"
        sp_cls = nn.remat(ResnetBlockSpatial) if remat_on else ResnetBlockSpatial
        tm_cls = nn.remat(ResnetBlockTemporal) if remat_on else ResnetBlockTemporal

        def call(mod, h):
            if remat_on:
                return mod(h)
            return mod(h, deterministic=deterministic, **stream)

        if causal:
            h = CausalConv3d(self.ch, (3, 3, 3), first_pad_mode=self.first_pad_mode,
                             name="conv_in")(x, **stream)
        else:
            h = Conv3d(self.ch, (3, 3, 3), name="conv_in")(x)

        for i_level in range(n):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                sp_name = f"down_{i_level}_block_{i_block}"
                tm_name = f"down_temporal_{i_level}_block_{i_block}"
                h = call(sp_cls(
                    block_out, norm_type=self.norm_type, dropout=self.dropout,
                    name=sp_name), h)
                h = call(tm_cls(
                    block_out, causal=causal, norm_type=self.norm_type,
                    dropout=self.dropout, first_pad_mode=self.first_pad_mode,
                    name=tm_name), h)
            if i_level in spatial_ds:
                sd_cls = (nn.remat(SpatialDownsample) if remat_on
                          else SpatialDownsample)
                h = sd_cls(name=f"down_{i_level}_downsample")(h)
                if i_level in tempo_ds:
                    td = (nn.remat(TimeDownsampleRes2x) if remat_on
                          else TimeDownsampleRes2x)(
                        h.shape[-1], causal=causal,
                        first_pad_mode=self.first_pad_mode,
                        name=f"down_temporal_{i_level}_downsample")
                    h = td(h) if remat_on else td(h, **stream)

        # mid/attn stages remat'd too (decoder.py rationale: the 256p
        # train-step HBM dump showed the unrematted aux stages holding
        # GB-scale temporaries)
        mid_cls = nn.remat(ResnetBlock3D) if remat_on else ResnetBlock3D
        attn_cls = nn.remat(AttnBlock) if remat_on else AttnBlock
        h = call(mid_cls(
            h.shape[-1], causal=causal, norm_type=self.norm_type,
            dropout=self.dropout, first_pad_mode=self.first_pad_mode,
            name="mid_block_1"), h)
        h = attn_cls(norm_type=self.norm_type, causal=causal,
                     name="mid_attn_1")(h)
        h = call(mid_cls(
            h.shape[-1], causal=causal, norm_type=self.norm_type,
            dropout=self.dropout, first_pad_mode=self.first_pad_mode,
            name="mid_block_2"), h)

        # Causal models fold T into batch before norm_out (per-frame stats,
        # model_3dcausal.py:664-668); the non-causal model normalizes the full
        # 5D tensor (model_3dnoncausal.py:479).
        h = self._norm_out(h)
        h = silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        if causal:
            h = CausalConv3d(out_ch, (3, 3, 3), first_pad_mode=self.first_pad_mode,
                             name="conv_out")(h, **stream)
        else:
            h = Conv3d(out_ch, (3, 3, 3), name="conv_out")(h)
        return h

    def _norm_out(self, h):
        from .blocks import _named_norm

        mode = "frame" if self.causal else "video"
        return _named_norm(self.norm_type, mode, "norm_out")(h)
