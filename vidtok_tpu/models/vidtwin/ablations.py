"""VidTwin ablation ladder — the non-shipped reference model classes.

Reference vidtwin/models/vidtwin_ae.py:
  VidAutoEncoderQformer            (:282-447)  -> VidTwinQformer
  VidAutoEncoderQformerCompact     (:448-676)  -> VidTwinCompact
  VidAutoEncoderQformerCompactSym  (:677-926)  -> VidTwinSym
  VidAutoEncoderQformerCompactSymDis (:928-965) -> VidTwinSym(dis=True)
  VidAutoEncoderQformerCompactSymVid (:967-1216) -> VidTwinVAE(vae=False)
  VidAutoEncoderQformerCompactSymVidVAE (:1220-1479) -> VidTwinVAE (shipped)

All share the factorized ST-transformer backbone and differ in how the
latent bottleneck decomposes the token grid:
  * Qformer: three Q-Formers compress the temporal / height / width axes
    independently.
  * Compact: one temporal Q-Former over channel-reduced per-frame summaries
    (content) + one spatial Q-Former per frame (motion).
  * Sym: Compact's spatial-Q-Former motion + a conv pyramid bottleneck on
    the content tokens; Dis variant trains content on frame-shuffled inputs.

Every class exposes ``__call__(x, return_features=...)`` returning
``(z, dec, reg_log, latents...)`` (and pre-final-layer features when
requested) so the VidTwin GAN trainer drives them interchangeably.

Token layout: channels-last [B, F, H', W', C] everywhere (the reference
carries (b, c', f, h', w') and rearranges around each op; channels-last
makes every einsum/conv here layout-native on TPU).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .qformer import QFormerInterface
from .st_transformer import STTDecoder, STTEncoder
from .vidtwin_ae import TokenMix


class EmbSeq(nn.Module):
    """Dense(C -> hidden) + ReLU + TokenMix(tokens -> tokens_out) + ReLU —
    the reference's recurring ``nn.Sequential(Linear, ReLU, Conv1d, ReLU)``
    embedding head (e.g. cont_emb, vidtwin_ae.py:370-376)."""

    hidden: int
    tokens_out: int

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(self.hidden, name="dense")(x))
        return nn.relu(TokenMix(self.tokens_out, name="mix")(h))


def _ln_noaffine(x, eps=1e-5):
    """The reference builds a *fresh* default nn.LayerNorm in forward
    (vidtwin_ae.py:650-656), i.e. unit scale / zero bias every call — a
    non-affine layer norm in effect."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    return ((xf - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


class VidTwinQformer(nn.Module):
    """Three-Q-Former ablation (reference :282-447): temporal, height and
    width Q-Formers each compress one axis of the token grid."""

    encoder: STTEncoder
    decoder: STTDecoder
    temporal_qformer: QFormerInterface
    height_qformer: QFormerInterface
    width_qformer: QFormerInterface

    @property
    def hidden_dim(self):
        return self.encoder.hidden_size

    def setup(self):
        pn = tuple(self.encoder.input_size[i] // self.encoder.patch_size[i]
                   for i in range(3))
        self.patch_nums = pn
        self.cont_emb = EmbSeq(self.hidden_dim, pn[0])
        self.height_emb = EmbSeq(self.hidden_dim, pn[1])
        self.width_emb = EmbSeq(self.hidden_dim, pn[2])

    def encode(self, x):
        """x: [B,T,H,W,C] -> (z, u_t [B,Fq,H,W,Cq], u_h [B,F,Hq,W,Cq],
        u_w [B,F,H,Wq,Cq], reg_log)."""
        z = self.encoder(x)  # [B, F, H, W, C]
        b, f, hh, ww, c = z.shape
        u_t = self.temporal_qformer(
            jnp.transpose(z, (0, 2, 3, 1, 4)).reshape(b * hh * ww, f, c))
        u_t = jnp.transpose(
            u_t.reshape(b, hh, ww, *u_t.shape[1:]), (0, 3, 1, 2, 4))
        u_h = self.height_qformer(
            jnp.transpose(z, (0, 1, 3, 2, 4)).reshape(b * f * ww, hh, c))
        u_h = jnp.transpose(
            u_h.reshape(b, f, ww, *u_h.shape[1:]), (0, 1, 3, 2, 4))
        u_w = self.width_qformer(z.reshape(b * f * hh, ww, c))
        u_w = u_w.reshape(b, f, hh, *u_w.shape[1:])
        return z, u_t, u_h, u_w, {"kl_loss": jnp.float32(0.0)}

    def decode(self, u_t, u_h, u_w, return_features: bool = False):
        f, hh, ww = self.patch_nums
        b = u_t.shape[0]
        # content: mix Fq query tokens up to F frames per spatial site
        ct = jnp.transpose(u_t, (0, 2, 3, 1, 4))  # [B,H,W,Fq,Cq]
        ct = self.cont_emb(ct.reshape(b * hh * ww, *ct.shape[3:]))
        vt = jnp.transpose(ct.reshape(b, hh, ww, f, self.hidden_dim),
                           (0, 3, 1, 2, 4))
        # height: mix Hq tokens up to H rows per (frame, column)
        chh = jnp.transpose(u_h, (0, 1, 3, 2, 4))  # [B,F,W,Hq,Cq]
        chh = self.height_emb(chh.reshape(b * f * ww, *chh.shape[3:]))
        vx = jnp.transpose(chh.reshape(b, f, ww, hh, self.hidden_dim),
                           (0, 1, 3, 2, 4))
        # width: mix Wq tokens up to W columns per (frame, row)
        cww = self.width_emb(u_w.reshape(b * f * hh, *u_w.shape[3:]))
        vy = cww.reshape(b, f, hh, ww, self.hidden_dim)
        return self.decoder(vt + vx + vy, return_features=return_features)

    def __call__(self, x, sample_override=None, return_features: bool = False):
        z, u_t, u_h, u_w, reg_log = self.encode(x)
        dec = self.decode(u_t, u_h, u_w, return_features=return_features)
        if return_features:
            dec, pre = dec
            return z, dec, pre, reg_log, (u_t, u_h, u_w)
        return z, dec, reg_log, (u_t, u_h, u_w)


class VidTwinCompact(nn.Module):
    """Compact ablation (reference :448-676): one temporal Q-Former over
    channel-reduced per-frame token summaries (content, [B,Fq,Cq]) + one
    spatial Q-Former (motion)."""

    encoder: STTEncoder
    decoder: STTDecoder
    temporal_qformer: QFormerInterface
    space_qformer: QFormerInterface
    retain_num_frames: bool = True
    temporal_down_dim: int = 32
    repeat_for_decoder: bool = False
    partial_content_motion: str = "all"
    shuffle_content: bool = False

    @property
    def hidden_dim(self):
        return self.encoder.hidden_size

    def setup(self):
        pn = tuple(self.encoder.input_size[i] // self.encoder.patch_size[i]
                   for i in range(3))
        self.patch_nums = pn
        self.down_channel_temp = nn.Dense(self.temporal_down_dim)
        self.pre_temporal_qformer = nn.Dense(self.hidden_dim)
        if not self.retain_num_frames:
            self.pre_spatial_1 = nn.Dense(2 * self.hidden_dim)
            self.pre_spatial_2 = nn.Dense(self.hidden_dim)
        if self.repeat_for_decoder:
            self.cont_emb = EmbSeq(self.hidden_dim, pn[1] * pn[2])
        else:
            self.cont_dense_1 = nn.Dense(self.hidden_dim)
            self.cont_dense_2 = nn.Dense(
                self.temporal_down_dim * pn[1] * pn[2])
            self.cont_mix = TokenMix(pn[0])
            self.up_channel_temp = nn.Dense(self.hidden_dim)
        if self.retain_num_frames:
            self.spatial_emb = EmbSeq(self.hidden_dim, pn[1] * pn[2])
        else:
            self.spatial_dense_1 = nn.Dense(self.hidden_dim)
            self.spatial_dense_2 = nn.Dense(self.hidden_dim * pn[0])
            self.spatial_mix = TokenMix(pn[1] * pn[2])

    # -- latent heads -------------------------------------------------------

    def _content_tokens(self, z):
        """[B,F,H,W,C] -> [B,Fq,Cq] (reference encode :639-655)."""
        b, f, hh, ww, c = z.shape
        h = self.down_channel_temp(z).reshape(b, f, -1)
        h = nn.relu(self.pre_temporal_qformer(h))
        return _ln_noaffine(self.temporal_qformer(h))

    def _motion_tokens(self, z):
        b, f, hh, ww, c = z.shape
        if self.retain_num_frames:
            m = self.space_qformer(z.reshape(b * f, hh * ww, c))
            return _ln_noaffine(m.reshape(b, f, *m.shape[1:]))
        h = z.reshape(b, f, hh * ww, c)
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b, hh * ww, f * c)
        h = nn.relu(self.pre_spatial_1(h))
        h = nn.relu(self.pre_spatial_2(h))
        return _ln_noaffine(self.space_qformer(h))

    def encode(self, x, rng=None):
        z = self.encoder(x)
        z_q = z
        if self.shuffle_content:
            b, f = z.shape[0], z.shape[1]
            r = rng if rng is not None else self.make_rng("sample")
            perms = jax.vmap(lambda k: jax.random.permutation(k, f))(
                jax.random.split(r, b))
            z_q = jax.vmap(lambda zi, p: zi[p])(z, perms)
        return (z, self._content_tokens(z_q), self._motion_tokens(z),
                {"kl_loss": jnp.float32(0.0)})

    # -- decode (reference :609-637) ----------------------------------------

    def _content_field(self, u_c):
        f, hh, ww = self.patch_nums
        b = u_c.shape[0]
        if self.repeat_for_decoder:
            rep = jnp.broadcast_to(u_c[:, None], (b, f) + u_c.shape[1:])
            h = self.cont_emb(rep.reshape(b * f, *u_c.shape[1:]))
            return h.reshape(b, f, hh, ww, self.hidden_dim)
        h = nn.relu(self.cont_dense_1(u_c))
        h = nn.relu(self.cont_dense_2(h))
        h = nn.relu(self.cont_mix(h))  # [B, F, tdd*H*W]
        # reference 'B F (C H W) -> B C F H W' (:613-616)
        h = h.reshape(b, f, self.temporal_down_dim, hh, ww)
        h = jnp.transpose(h, (0, 1, 3, 4, 2))
        return self.up_channel_temp(h)

    def _motion_field(self, u_m):
        f, hh, ww = self.patch_nums
        b = u_m.shape[0]
        if self.retain_num_frames:
            h = self.spatial_emb(u_m.reshape(b * f, *u_m.shape[2:]))
            return h.reshape(b, f, hh, ww, self.hidden_dim)
        h = nn.relu(self.spatial_dense_1(u_m))
        h = nn.relu(self.spatial_dense_2(h))
        h = nn.relu(self.spatial_mix(h))  # [B, H*W, F*hidden]
        # reference 'B (H W) (F C) -> B C F H W' (:629-631)
        h = h.reshape(b, hh, ww, f, self.hidden_dim)
        return jnp.transpose(h, (0, 3, 1, 2, 4))

    def decode(self, u_c, u_m, only_part: Optional[str] = None,
               return_features: bool = False):
        part = only_part or (None if self.partial_content_motion == "all"
                             else self.partial_content_motion)
        if part == "content":
            cm = self._content_field(u_c)
        elif part == "motion":
            cm = self._motion_field(u_m)
        else:
            cm = self._content_field(u_c) + self._motion_field(u_m)
        return self.decoder(cm, return_features=return_features)

    def __call__(self, x, sample_override=None, return_features: bool = False):
        z, u_c, u_m, reg_log = self.encode(x)
        dec = self.decode(u_c, u_m, return_features=return_features)
        if return_features:
            dec, pre = dec
            return z, dec, pre, reg_log, (u_c, u_m)
        return z, dec, reg_log, (u_c, u_m)


class VidTwinSym(nn.Module):
    """Sym ablation (reference :677-926): per-site temporal Q-Former content
    squeezed through a conv pyramid (like the shipped VAE, but without the
    gaussian) + Compact's per-frame spatial Q-Former motion.

    ``dis=True`` is the SymDis variant (reference :928-965): each sample's
    frames are shuffled with probability ``shuffle_ratio`` before the
    content pathway, while motion always sees the original order."""

    encoder: STTEncoder
    decoder: STTDecoder
    temporal_qformer: QFormerInterface
    space_qformer: QFormerInterface
    expect_ch: int = 4
    init_ch: int = 128
    cont_num_blocks: int = 2
    retain_num_frames: bool = True
    partial_content_motion: str = "all"
    shuffle_content: bool = False
    dis: bool = False
    shuffle_ratio: float = 0.5

    @property
    def hidden_dim(self):
        return self.encoder.hidden_size

    def setup(self):
        pn = tuple(self.encoder.input_size[i] // self.encoder.patch_size[i]
                   for i in range(3))
        self.patch_nums = pn
        self.conv_in = nn.Conv(self.init_ch, (3, 3), padding=1)
        ch = self.init_ch
        downs = []
        for i in range(self.cont_num_blocks):
            ch *= 2
            downs.append(nn.Conv(ch, (3, 3), strides=2, padding=1,
                                 name=f"content_down_{i}"))
        self.content_down = downs
        self.max_channels = ch
        self.bottle_down = nn.Conv(self.expect_ch, (3, 3), padding=1)
        self.bottle_up = nn.Conv(self.max_channels, (3, 3), padding=1)
        ups = []
        for i in range(self.cont_num_blocks):
            ch //= 2
            ups.append(nn.Conv(ch, (3, 3), padding=1, name=f"content_up_{i}"))
        self.content_up = ups
        self.conv_out = nn.Conv(self.temporal_qformer.query_hidden_size,
                                (3, 3), padding=1)
        self.cont_emb = EmbSeq(self.hidden_dim, pn[0])
        if self.retain_num_frames:
            self.spatial_emb = EmbSeq(self.hidden_dim, pn[1] * pn[2])
        else:
            self.pre_spatial_1 = nn.Dense(2 * self.hidden_dim)
            self.pre_spatial_2 = nn.Dense(self.hidden_dim)
            self.spatial_dense_1 = nn.Dense(self.hidden_dim)
            self.spatial_dense_2 = nn.Dense(self.hidden_dim * pn[0])
            self.spatial_mix = TokenMix(pn[1] * pn[2])

    def _content_tokens(self, z):
        """[B,F,H,W,C] -> [B,Fq,h,w,expect_ch] via Q-Former + conv pyramid
        (reference encode :892-900)."""
        b, f, hh, ww, c = z.shape
        pre = jnp.transpose(z, (0, 2, 3, 1, 4)).reshape(b * hh * ww, f, c)
        zc = self.temporal_qformer(pre)  # [(BHW), Fq, Cq]
        fq, cq = zc.shape[1], zc.shape[2]
        zc = zc.reshape(b, hh, ww, fq, cq)
        zc = jnp.transpose(zc, (0, 3, 1, 2, 4)).reshape(b * fq, hh, ww, cq)
        h = self.conv_in(zc)
        for blk in self.content_down:
            h = nn.relu(blk(h))
        h = self.bottle_down(h)
        return h.reshape((b, fq) + h.shape[1:])

    def _motion_tokens(self, z):
        b, f, hh, ww, c = z.shape
        if self.retain_num_frames:
            m = self.space_qformer(z.reshape(b * f, hh * ww, c))
            return m.reshape(b, f, *m.shape[1:])
        h = z.reshape(b, f, hh * ww, c)
        h = jnp.transpose(h, (0, 2, 1, 3)).reshape(b, hh * ww, f * c)
        h = nn.relu(self.pre_spatial_1(h))
        h = nn.relu(self.pre_spatial_2(h))
        return self.space_qformer(h)

    def encode(self, x, rng=None):
        if self.dis:
            # SymDis (reference :940-965): encode [x ; maybe-shuffled x],
            # content sees the shuffled half, motion the original
            b, f = x.shape[0], x.shape[1]
            r = rng if rng is not None else self.make_rng("sample")
            r_gate, r_perm = jax.random.split(r)
            gates = jax.random.uniform(r_gate, (b,)) < self.shuffle_ratio
            perms = jax.vmap(lambda k: jax.random.permutation(k, f))(
                jax.random.split(r_perm, b))
            ident = jnp.broadcast_to(jnp.arange(f), (b, f))
            perms = jnp.where(gates[:, None], perms, ident)
            x_sh = jax.vmap(lambda xi, p: xi[p])(x, perms)
            z2 = self.encoder(jnp.concatenate([x, x_sh], axis=0))
            z, z_sh = z2[:b], z2[b:]
            return (z2, self._content_tokens(z_sh), self._motion_tokens(z),
                    {"kl_loss": jnp.float32(0.0)})
        z = self.encoder(x)
        z_q = z
        if self.shuffle_content:
            b, f = z.shape[0], z.shape[1]
            r = rng if rng is not None else self.make_rng("sample")
            perms = jax.vmap(lambda k: jax.random.permutation(k, f))(
                jax.random.split(r, b))
            z_q = jax.vmap(lambda zi, p: zi[p])(z, perms)
        return (z, self._content_tokens(z_q), self._motion_tokens(z),
                {"kl_loss": jnp.float32(0.0)})

    def _content_field(self, u_c):
        f, hh, ww = self.patch_nums
        b, fq = u_c.shape[0], u_c.shape[1]
        zc = u_c.reshape((b * fq,) + u_c.shape[2:])
        h = nn.relu(self.bottle_up(zc))
        for blk in self.content_up:
            h = nn.relu(blk(h))
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        zc = self.conv_out(h)
        if zc.shape[1] > hh:
            border = (zc.shape[1] - hh) // 2
            zc = zc[:, border:border + hh, border:border + ww]
        cq = zc.shape[-1]
        zc = zc.reshape(b, fq, hh, ww, cq)
        zc = jnp.transpose(zc, (0, 2, 3, 1, 4)).reshape(b * hh * ww, fq, cq)
        h = self.cont_emb(zc)
        return jnp.transpose(
            h.reshape(b, hh, ww, f, self.hidden_dim), (0, 3, 1, 2, 4))

    def _motion_field(self, u_m):
        f, hh, ww = self.patch_nums
        b = u_m.shape[0]
        if self.retain_num_frames:
            h = self.spatial_emb(u_m.reshape(b * f, *u_m.shape[2:]))
            return h.reshape(b, f, hh, ww, self.hidden_dim)
        h = nn.relu(self.spatial_dense_1(u_m))
        h = nn.relu(self.spatial_dense_2(h))
        h = nn.relu(self.spatial_mix(h))
        h = h.reshape(b, hh, ww, f, self.hidden_dim)
        return jnp.transpose(h, (0, 3, 1, 2, 4))

    def decode(self, u_c, u_m, only_part: Optional[str] = None,
               return_features: bool = False):
        part = only_part or (None if self.partial_content_motion == "all"
                             else self.partial_content_motion)
        if part == "content":
            cm = self._content_field(u_c)
        elif part == "motion":
            cm = self._motion_field(u_m)
        else:
            cm = self._content_field(u_c) + self._motion_field(u_m)
        return self.decoder(cm, return_features=return_features)

    def __call__(self, x, sample_override=None, return_features: bool = False):
        z, u_c, u_m, reg_log = self.encode(x)
        dec = self.decode(u_c, u_m, return_features=return_features)
        if return_features:
            dec, pre = dec
            return z, dec, pre, reg_log, (u_c, u_m)
        return z, dec, reg_log, (u_c, u_m)
