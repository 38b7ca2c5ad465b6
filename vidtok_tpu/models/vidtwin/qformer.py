"""Q-Former (BLIP-2 style): learned query tokens, BERT-style post-LN layers
with self-attention and periodic cross-attention into encoder states.

Reference: vidtwin/modules/qformer.py (vendored HF Blip2QFormer, :33-619)
and ``MyQformerInterface`` (:624-634). Defaults mirror Blip2QFormerConfig:
gelu FFN, layer_norm_eps 1e-12, cross_attention_frequency 2 (layers 0, 2,
4 ... carry cross-attention).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _ln(name):
    return nn.LayerNorm(epsilon=1e-12, name=name)


class BertSelfAttention(nn.Module):
    """Post-LN attention: out = LN(dense(attn(x)) + x). q from hidden; k/v
    from ``kv`` (cross-attention) or hidden (self-attention)."""

    hidden_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, kv=None):
        kv_in = x if kv is None else kv
        h = self.num_heads
        hd = self.hidden_size // h
        q = nn.Dense(self.hidden_size, name="query")(x)
        k = nn.Dense(self.hidden_size, name="key")(kv_in)
        v = nn.Dense(self.hidden_size, name="value")(kv_in)
        b, nq, _ = q.shape
        nk = k.shape[1]
        qh = q.reshape(b, nq, h, hd)
        kh = k.reshape(b, nk, h, hd)
        vh = v.reshape(b, nk, h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(hd).astype(x.dtype)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(b, nq, self.hidden_size)
        out = nn.Dense(self.hidden_size, name="out_dense")(ctx)
        return _ln("out_norm")(out + x)


class QFormerLayer(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    has_cross_attention: bool

    @nn.compact
    def __call__(self, x, encoder_states):
        x = BertSelfAttention(self.hidden_size, self.num_heads,
                              name="attention")(x)
        if self.has_cross_attention:
            x = BertSelfAttention(self.hidden_size, self.num_heads,
                                  name="crossattention")(x, kv=encoder_states)
        h = nn.Dense(self.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_size, name="output")(h)
        x = _ln("output_norm")(h + x)
        return x


class QFormerInterface(nn.Module):
    """Learnable query tokens -> cross-attended summary
    (reference MyQformerInterface, qformer.py:624-634).

    ``__call__(encoder_hidden_states [B, L, enc_C]) -> [B, num_query, C]``.
    """

    num_query_tokens: int = 3
    query_hidden_size: int = 64
    encoder_hidden_size: int = 768
    num_hidden_layers: int = 6
    intermediate_size: int = 768
    num_attention_heads: int = 8
    cross_attention_frequency: int = 2

    @nn.compact
    def __call__(self, encoder_hidden_states):
        b = encoder_hidden_states.shape[0]
        queries = self.param("query_embeds", nn.initializers.normal(1.0),
                             (self.num_query_tokens, self.query_hidden_size))
        x = jnp.broadcast_to(queries[None], (b,) + queries.shape)
        x = _ln("layernorm")(x)
        for i in range(self.num_hidden_layers):
            x = QFormerLayer(
                self.query_hidden_size, self.num_attention_heads,
                self.intermediate_size,
                has_cross_attention=(i % self.cross_attention_frequency == 0),
                name=f"layer_{i}")(x, encoder_hidden_states)
        return x
