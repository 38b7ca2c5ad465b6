"""Factorized space-time transformer (VidTwin's backbone).

Reference: vidtwin/modules/st_transformer.py — PatchEmbed3D conv patchify
(:214-264), STBlock with per-block learnable scale-shift modulation and
spatial-then-temporal attention (:268-364), 2D+1D sincos position embeddings
(:367-425), STTEncoder/STTDecoder (:665-804) with a PixArt-style modulated
final layer (:56-72) and unpatchify (:581-603).

Precision policy: the reference runs an fp64 modulate -> bf16 attention ->
fp32 MLP dance (st_transformer.py:336-362). fp64 is TPU-hostile and
numerically unnecessary; we keep the *bf16 attention* (that is what affects
throughput and was empirically validated by the reference training) with
fp32 softmax, and do modulation/norm/MLP in fp32. ``attn_dtype`` switches
attention to full fp32 for strict parity testing.

Token layout: [B, T, S, C]; videos are channels-last [B, T, H, W, C].
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

approx_gelu = lambda x: nn.gelu(x, approximate=True)  # noqa: E731


def t2i_modulate(x, shift, scale):
    return x * (1 + scale) + shift


def _layer_norm_noaffine(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


def get_1d_sincos_pos_embed(embed_dim, length, scale=1.0):
    pos = np.arange(0, length, dtype=np.float64)[:, None] / scale
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = pos.reshape(-1)[:, None] * omega[None]
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


def get_2d_sincos_pos_embed(embed_dim, grid_size, scale=1.0):
    gh = np.arange(grid_size[0], dtype=np.float32) / scale
    gw = np.arange(grid_size[1], dtype=np.float32) / scale
    grid = np.meshgrid(gw, gh)  # w first (reference :407)
    grid = np.stack(grid, axis=0).reshape(2, 1, grid_size[1], grid_size[0])
    emb_h = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[0])
    emb_w = get_1d_sincos_pos_embed_from_grid(embed_dim // 2, grid[1])
    return np.concatenate([emb_h, emb_w], axis=1)


def get_1d_sincos_pos_embed_from_grid(embed_dim, pos):
    omega = np.arange(embed_dim // 2, dtype=np.float64) / (embed_dim / 2.0)
    omega = 1.0 / 10000 ** omega
    out = pos.reshape(-1)[:, None] * omega[None]
    return np.concatenate([np.sin(out), np.cos(out)], axis=1)


class Attention(nn.Module):
    """MHA with fused qkv; bf16 matmuls + fp32 softmax by default
    (reference Attention, st_transformer.py:74-140; torch path computes
    q@k in bf16, softmax in fp32, attn@v in bf16)."""

    dim: int
    num_heads: int = 8
    zero_init_proj: bool = False
    attn_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x, causal: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=True,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b,n,h,hd]
        dt = self.attn_dtype or x.dtype
        q = q.astype(dt) * (hd ** -0.5)
        k = k.astype(dt)
        v = v.astype(dt)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        attn = attn.astype(jnp.float32)
        if causal:
            mask = jnp.tril(jnp.ones((n, n), bool))
            attn = jnp.where(mask, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        proj_init = (nn.initializers.zeros if self.zero_init_proj
                     else nn.initializers.xavier_uniform())
        out = nn.Dense(c, kernel_init=proj_init, name="proj")(out.astype(x.dtype))
        return out


class GroupAttention(nn.Module):
    """Windowed attention: the sequence is split into contiguous groups of
    ``group_size`` tokens and attention runs within each group (reference
    GroupAttention, st_transformer.py:142-212). The reference's real
    semantics are its flash path (`flash_attn_func` on [B*G, group_size]
    with the causal flag); its non-flash branch is dead code with an
    ill-formed rearrange (:205-209, axis `S` undefined on the right), so we
    match the flash behavior, causal included."""

    dim: int
    num_heads: int = 8
    group_size: int = 4
    zero_init_proj: bool = False
    attn_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x, causal: bool = False):
        b, n, c = x.shape
        assert n % self.group_size == 0, (
            f"sequence length {n} not divisible by group_size {self.group_size}")
        g = n // self.group_size
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, use_bias=True,
                       kernel_init=nn.initializers.xavier_uniform(),
                       name="qkv")(x)
        qkv = qkv.reshape(b * g, self.group_size, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        dt = self.attn_dtype or x.dtype
        q = q.astype(dt) * (hd ** -0.5)
        k = k.astype(dt)
        v = v.astype(dt)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if causal:
            mask = jnp.tril(jnp.ones((self.group_size, self.group_size), bool))
            attn = jnp.where(mask, attn, -jnp.inf)
        attn = jax.nn.softmax(attn, axis=-1).astype(dt)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
        proj_init = (nn.initializers.zeros if self.zero_init_proj
                     else nn.initializers.xavier_uniform())
        out = nn.Dense(c, kernel_init=proj_init, name="proj")(out.astype(x.dtype))
        return out


def drop_path(x, rate: float, deterministic: bool, rng):
    """Stochastic depth on the residual branch: per-sample drop with rescale
    (reference timm DropPath, st_transformer.py:306)."""
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep,
                                (x.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    hidden: int

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = nn.Dense(self.hidden, kernel_init=nn.initializers.xavier_uniform(),
                     name="fc1")(x)
        h = approx_gelu(h)
        h = nn.Dense(c, kernel_init=nn.initializers.xavier_uniform(),
                     name="fc2")(h)
        return h


class STBlock(nn.Module):
    """Spatial attention over (B T) S C, temporal (optionally causal)
    attention over (B S) T C, modulated MLP (reference :268-364). Note the
    reference gates BOTH attention branches with gate_msa (:346, :357)."""

    hidden_size: int
    num_heads: int
    d_s: int
    d_t: int
    mlp_ratio: float = 4.0
    temporal_causal: bool = True
    no_temporal: bool = False
    temporal_group: bool = False
    group_size: int = 1
    drop_path_rate: float = 0.0
    attn_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @nn.compact
    def __call__(self, x, tpe=None, deterministic: bool = True):
        """x: [B, T, S, C]."""
        b, t, s, c = x.shape
        table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / self.hidden_size ** 0.5,
            (6, c))
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = table

        use_dp = self.drop_path_rate > 0.0 and not deterministic

        def dp(branch):
            if not use_dp:
                return branch
            return drop_path(branch, self.drop_path_rate, deterministic,
                             self.make_rng("dropout"))

        x_m = t2i_modulate(_layer_norm_noaffine(x), shift_msa, scale_msa)

        # spatial branch
        x_s = x_m.reshape(b * t, s, c)
        x_s = Attention(c, self.num_heads, attn_dtype=self.attn_dtype,
                        name="attn")(x_s, causal=False)
        x = x + dp(gate_msa * x_s.reshape(b, t, s, c))

        if not self.no_temporal:
            x_t = jnp.swapaxes(x, 1, 2).reshape(b * s, t, c)
            if tpe is not None:
                x_t = x_t + tpe
            # windowed temporal attention under temporal_group (reference
            # STBlock :312-320 swaps in GroupAttention for attn_temp)
            if self.temporal_group:
                x_t = GroupAttention(c, self.num_heads,
                                     group_size=self.group_size,
                                     zero_init_proj=True,
                                     attn_dtype=self.attn_dtype,
                                     name="attn_temp")(
                    x_t, causal=self.temporal_causal)
            else:
                x_t = Attention(c, self.num_heads, zero_init_proj=True,
                                attn_dtype=self.attn_dtype,
                                name="attn_temp")(x_t,
                                                  causal=self.temporal_causal)
            x_t = jnp.swapaxes(x_t.reshape(b, s, t, c), 1, 2)
            x = x + dp(gate_msa * x_t)

        h = t2i_modulate(_layer_norm_noaffine(x), shift_mlp, scale_mlp)
        x = x + dp(gate_mlp * Mlp(int(c * self.mlp_ratio), name="mlp")(h))
        return x


class T2IFinalLayer(nn.Module):
    """Modulated linear head (reference :56-72); linear is zero-init
    (reference :662-663)."""

    num_patch: int
    out_channels: int

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        c = x.shape[-1]
        table = self.param(
            "scale_shift_table",
            lambda key, shape: jax.random.normal(key, shape) / c ** 0.5,
            (2, c))
        shift, scale = table
        h = t2i_modulate(_layer_norm_noaffine(x), shift, scale)
        out = nn.Dense(self.num_patch * self.out_channels,
                       kernel_init=nn.initializers.zeros, name="linear")(h)
        if return_features:
            return out, h
        return out

    def apply_linear(self, linear_params, h):
        return h @ linear_params["kernel"] + linear_params["bias"]


class PatchEmbed3D(nn.Module):
    """Conv patchify [B,T,H,W,C] -> [B, N, C_emb] (reference :214-264)."""

    patch_size: Tuple[int, int, int]
    embed_dim: int

    @nn.compact
    def __call__(self, x):
        pt, ph, pw = self.patch_size
        b, t, h, w, c = x.shape
        pads = [(0, (-t) % pt), (0, (-h) % ph), (0, (-w) % pw)]
        if any(p[1] for p in pads):
            x = jnp.pad(x, [(0, 0)] + pads + [(0, 0)])
        x = nn.Conv(self.embed_dim, kernel_size=self.patch_size,
                    strides=self.patch_size, padding="VALID",
                    kernel_init=nn.initializers.xavier_uniform(),
                    name="proj")(x)
        return x.reshape(b, -1, self.embed_dim)


class STTransformer(nn.Module):
    input_size: Tuple[int, int, int] = (16, 224, 224)
    in_channels: int = 3
    patch_size: Tuple[int, int, int] = (1, 16, 16)
    hidden_size: int = 768
    depth: int = 16
    num_heads: int = 12
    mlp_ratio: float = 4.0
    temporal_causal: bool = True
    no_temporal: bool = False
    temporal_group: bool = False
    group_size: int = 1
    drop_path: float = 0.0
    space_scale: float = 1.0
    time_scale: float = 1.0
    attn_dtype: Optional[jnp.dtype] = jnp.bfloat16

    @property
    def num_temporal(self):
        return self.input_size[0] // self.patch_size[0]

    @property
    def num_spatial(self):
        return ((self.input_size[1] // self.patch_size[1])
                * (self.input_size[2] // self.patch_size[2]))

    def spatial_pos_embed(self):
        gh = self.input_size[1] // self.patch_size[1]
        gw = self.input_size[2] // self.patch_size[2]
        return jnp.asarray(get_2d_sincos_pos_embed(
            self.hidden_size, (gh, gw), scale=self.space_scale), jnp.float32)

    def temporal_pos_embed(self):
        return jnp.asarray(get_1d_sincos_pos_embed(
            self.hidden_size, self.num_temporal, scale=self.time_scale),
            jnp.float32)

    def run_blocks(self, x, deterministic: bool = True):
        """x: [B, N=(T S), C] -> same."""
        b = x.shape[0]
        t, s = self.num_temporal, self.num_spatial
        x = x.reshape(b, t, s, self.hidden_size)
        x = x + self.spatial_pos_embed()[None, None]
        tpe = self.temporal_pos_embed()[None]
        # per-block stochastic-depth rates: linspace(0, drop_path, depth)
        # (reference st_transformer.py:523)
        for i in range(self.depth):
            rate = (self.drop_path * i / max(self.depth - 1, 1)
                    if self.drop_path > 0 else 0.0)
            x = STBlock(self.hidden_size, self.num_heads, d_s=s, d_t=t,
                        mlp_ratio=self.mlp_ratio,
                        temporal_causal=self.temporal_causal,
                        no_temporal=self.no_temporal,
                        temporal_group=self.temporal_group,
                        group_size=self.group_size,
                        drop_path_rate=rate,
                        attn_dtype=self.attn_dtype,
                        name=f"blocks_{i}")(x, tpe if i == 0 else None,
                                            deterministic=deterministic)
        return x.reshape(b, t * s, self.hidden_size)


class STTEncoder(STTransformer):
    """[B,T,H,W,Cin] -> latent tokens [B, T', H', W', hidden]
    (reference :665-673)."""

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = PatchEmbed3D(tuple(self.patch_size), self.hidden_size,
                         name="x_embedder")(x)
        y = self.run_blocks(x, deterministic=deterministic)
        t = self.num_temporal
        gh = self.input_size[1] // self.patch_size[1]
        gw = self.input_size[2] // self.patch_size[2]
        return y.reshape(y.shape[0], t, gh, gw, self.hidden_size)


class STTDecoder(STTransformer):
    """latent tokens [B, T', H', W', hidden] -> video [B,T,H,W,out]
    (reference :734-744). ``return_features`` additionally yields the
    modulated pre-linear activations for the adaptive GAN weight."""

    @nn.compact
    def __call__(self, z, return_features: bool = False,
                 deterministic: bool = True):
        b, t, gh, gw, c = z.shape
        x = z.reshape(b, t * gh * gw, c)
        y = self.run_blocks(x, deterministic=deterministic)
        num_patch = int(np.prod(self.patch_size))
        final = T2IFinalLayer(num_patch, self.in_channels, name="final_layer")
        if return_features:
            y, pre = final(y, return_features=True)
        else:
            y = final(y)
        out = self.unpatchify(y)
        if return_features:
            return out, pre
        return out

    def unpatchify(self, y):
        """[B, N, num_patch*C] -> [B, T, H, W, C] (reference :581-603)."""
        b = y.shape[0]
        nt = self.num_temporal
        nh = self.input_size[1] // self.patch_size[1]
        nw = self.input_size[2] // self.patch_size[2]
        pt, ph, pw = self.patch_size
        c = self.in_channels
        y = y.reshape(b, nt, nh, nw, pt, ph, pw, c)
        y = jnp.einsum("bthwpqrc->btphqwrc", y)
        return y.reshape(b, nt * pt, nh * ph, nw * pw, c)
