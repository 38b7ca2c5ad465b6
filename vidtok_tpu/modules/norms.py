"""Normalization layers (channels-last, fp32 statistics).

Semantics mirror reference vidtok/modules/model_3dcausal.py:30-80 — with
particular care for *which axes* GroupNorm statistics span, because the
reference folds tensors into batch before normalizing and the fold differs
per block type (and in the temporal blocks the fold uses the already-folded
batch size, reference model_3dcausal.py:474-477, collapsing the spatial axis
to 1):

  mode        stats per              stats over          reference usage
  ----------  --------------------   -----------------   -------------------
  'frame'     (b, t, group)          (h, w, c/g)         spatial & causal-3D
                                                         blocks, causal
                                                         norm_out, attn norm
  'video'     (b, group)             (t, h, w, c/g)      non-causal mid/out
  'position'  (b, t, h, w, group)    (c/g,)              causal temporal
                                                         resblocks
  'column'    (b, h, w, group)       (t, c/g)            non-causal temporal
                                                         resblocks

LayerNorm (torch nn.LayerNorm(C) on channels-last) is per-position over the
channel axis in every fold, so it needs no mode. All statistics are computed
in fp32 regardless of input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


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
    """GroupNorm(32 groups) over [B,T,H,W,C] with reference-exact statistic
    axes selected by ``mode`` (see module docstring)."""

    num_groups: int = 32
    eps: float = 1e-6
    mode: str = "frame"  # frame | video | position | column

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
        assert xf.ndim == 5, f"GroupNorm expects [B,T,H,W,C], got rank {xf.ndim}"
        b, t, h, w, _ = shape
        xg = xf.reshape(b, t, h, w, g, c // g)

        if self.mode == "frame":
            axes = (2, 3, 5)
        elif self.mode == "video":
            axes = (1, 2, 3, 5)
        elif self.mode == "position":
            axes = (5,)
        elif self.mode == "column":
            axes = (1, 5)
        else:
            raise ValueError(f"unknown GroupNorm mode {self.mode!r}")

        mean = jnp.mean(xg, axis=axes, keepdims=True)
        var = jnp.mean(jnp.square(xg - mean), axis=axes, keepdims=True)
        y = (xg - mean) / jnp.sqrt(var + self.eps)
        y = y.reshape(shape) * scale + bias
        return y.astype(dtype)


def make_norm(norm_type: str, mode: str = "frame", name=None) -> nn.Module:
    """Factory matching reference ``Normalize`` (model_3dcausal.py:30-34)."""
    if norm_type == "groupnorm":
        return GroupNorm(mode=mode, name=name)
    if norm_type == "layernorm":
        return ChannelLayerNorm(name=name)
    raise ValueError(f"unknown norm_type {norm_type!r}")


def silu(x):
    """x * sigmoid(x) — reference ``nonlinearity`` (model_3dcausal.py:26-27)."""
    return x * nn.sigmoid(x)
