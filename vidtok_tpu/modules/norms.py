"""Normalization layers (channels-last, fp32 statistics).

Semantics mirror reference vidtok/modules/model_3dcausal.py:30-80:

* ``layernorm``: torch ``nn.LayerNorm(num_channels)`` on channels-last data —
  per-position statistics over the channel axis only. Layout-invariant, so
  the reference's (b t) folding has no numerical effect here.
* ``groupnorm``: torch ``nn.GroupNorm(32, C, eps=1e-6)``. The reference folds
  T into batch before normalizing in the causal models
  (model_3dcausal.py:403-416), making statistics per-frame; the non-causal
  mid/out blocks normalize over the full (T,H,W) extent. ``fold_time``
  selects between the two.

All statistics are computed in fp32 regardless of input dtype (TPU precision
policy), matching the reference's fp32 autocast guards.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn
from jax import nn as jnn  # noqa: F401


class ChannelLayerNorm(nn.Module):
    """LayerNorm over the trailing channel axis. eps matches reference 1e-6."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        dtype = x.dtype
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
        y = (xf - mean) / jnp.sqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(dtype)


class GroupNorm(nn.Module):
    """GroupNorm(32 groups) with optional per-frame statistics.

    Input is [..., H, W, C] (rank 4 ``[N,H,W,C]``) or [B, T, H, W, C]
    (rank 5). With ``fold_time=True`` (causal-model semantics) rank-5 inputs
    are normalized per frame; otherwise over the full temporal extent.
    """

    num_groups: int = 32
    eps: float = 1e-6
    fold_time: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        assert c % g == 0, f"channels {c} not divisible by {g} groups"
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        dtype = x.dtype
        xf = x.astype(jnp.float32)

        shape = xf.shape
        if xf.ndim == 5 and self.fold_time:
            # [B,T,H,W,C] -> stats per (b, t, group)
            b, t, h, w, _ = shape
            xg = xf.reshape(b, t, h * w, g, c // g)
            axes = (2, 4)
        elif xf.ndim == 5:
            b, t, h, w, _ = shape
            xg = xf.reshape(b, t * h * w, g, c // g)
            axes = (1, 3)
        elif xf.ndim == 4:
            b, h, w, _ = shape
            xg = xf.reshape(b, h * w, g, c // g)
            axes = (1, 3)
        elif xf.ndim == 3:
            b, s, _ = shape
            xg = xf.reshape(b, s, g, c // g)
            axes = (1, 3)
        else:
            raise ValueError(f"GroupNorm: unsupported rank {xf.ndim}")

        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
        y = (xg - mean) / jnp.sqrt(var + self.eps)
        y = y.reshape(shape) * scale + bias
        return y.astype(dtype)


def make_norm(norm_type: str, fold_time: bool = True) -> nn.Module:
    """Factory matching reference ``Normalize`` (model_3dcausal.py:30-34)."""
    if norm_type == "groupnorm":
        return GroupNorm(fold_time=fold_time)
    if norm_type == "layernorm":
        return ChannelLayerNorm()
    raise ValueError(f"unknown norm_type {norm_type!r}")


def silu(x):
    """x * sigmoid(x) — reference ``nonlinearity`` (model_3dcausal.py:26-27)."""
    return x * nn.sigmoid(x)
