"""VidTwin — decoupled Structure/Dynamics video VAE.

Reference: vidtwin/models/vidtwin_ae.py ``VidAutoEncoderQformerCompactSymVidVAE``
(:1220-1479), the class shipped in configs/vidtwin/*.yaml.

Pipeline (channels-last; shapes for the shipped 16x224x224 / patch 1x16x16 /
hidden 768 config):

  encode (reference :1434-1470):
    z = STTEncoder(x)                          [B, 16, 14, 14, 768]
    Structure: per spatial position, a temporal Q-Former summarizes the
      768-d token stream into 16 query tokens of 64-d; reassembled spatially
      and squeezed through a conv bottleneck to 2*expect_ch, then a
      DiagonalGaussian -> u_S [B, 16, 7, 7, expect_ch]
    Dynamics: (optionally spatially-downsampled) z is averaged over H and
      over W; a conv head maps to 2*d_dim; DiagonalGaussian ->
      u_Dx, u_Dy [B, d_dim, F, S] (reference layout kept for API parity)
  decode (reference :1402-1432): bottleneck-up + token-mix the structure
    latent to [B, F, H', W', hidden]; embed+broadcast the motion latents;
    sum vt+vx+vy and run STTDecoder.

Cross-reenactment (reference inference_vidtwin_cross_reconstruct.py:232-239)
falls out of the decomposed ``decode(u_S_A, u_D_B)`` API.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ...modules.regularizers import DiagonalGaussian
from .qformer import QFormerInterface
from .st_transformer import STTDecoder, STTEncoder


class TokenMix(nn.Module):
    """torch Conv1d(tokens_in, tokens_out, k=1) over the token axis of
    [B, tokens, C] — a learned linear mix of tokens per feature."""

    tokens_out: int

    @nn.compact
    def __call__(self, x):
        tokens_in = x.shape[1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.tokens_out, tokens_in))
        b = self.param("bias", nn.initializers.zeros, (self.tokens_out,))
        return jnp.einsum("ot,btc->boc", w, x) + b[None, :, None]


class VidTwinVAE(nn.Module):
    encoder: STTEncoder
    decoder: STTDecoder
    qformer: QFormerInterface
    expect_ch: int = 4
    d_dim: int = 16
    init_ch: int = 128
    cont_num_blocks: int = 2
    motion_num_blocks: int = 2
    downsample_motion: bool = False
    sample: bool = True
    # training-time disentanglement: shuffle frames per sample before the
    # structure Q-Former (reference shuffle_content, vidtwin_ae.py:1436-1442)
    shuffle_content: bool = False
    # vae=False is the SymVid (non-gaussian) ablation (reference
    # VidAutoEncoderQformerCompactSymVid, vidtwin_ae.py:967-1216): latent
    # heads emit expect_ch / d_dim directly and nothing is sampled
    vae: bool = True
    # decode-time content/motion gating default (reference
    # partial_content_motion kwarg, vidtwin_ae.py:990)
    partial_content_motion: str = "all"

    @property
    def hidden_dim(self):
        return self.encoder.hidden_size

    @property
    def patch_nums(self):
        return tuple(self.encoder.input_size[i] // self.encoder.patch_size[i]
                     for i in range(3))

    def setup(self):
        # content bottleneck (reference :1312-1351)
        self.conv_in = nn.Conv(self.init_ch, (3, 3), padding=1)
        ch = self.init_ch
        downs = []
        for i in range(self.cont_num_blocks):
            ch *= 2
            downs.append(nn.Conv(ch, (3, 3), strides=2, padding=1,
                                 name=f"content_down_{i}"))
        self.content_down = downs
        self.max_channels = ch
        self.bottle_down = nn.Conv(
            (2 if self.vae else 1) * self.expect_ch, (3, 3), padding=1)
        self.bottle_up = nn.Conv(self.max_channels, (3, 3), padding=1)
        ups = []
        for i in range(self.cont_num_blocks):
            ch //= 2
            ups.append(nn.Conv(ch, (3, 3), padding=1, name=f"content_up_{i}"))
        self.content_up = ups
        self.conv_out = nn.Conv(self.qformer.query_hidden_size, (3, 3),
                                padding=1)
        # structure -> decoder embedding (reference cont_emb, :1312-1317)
        self.cont_emb_dense = nn.Dense(self.hidden_dim)
        self.cont_emb_mix = TokenMix(self.patch_nums[0])
        # dynamics (reference :1353-1373)
        self.motion_emb_1 = nn.Dense(self.hidden_dim)
        self.motion_emb_2 = nn.Dense(self.hidden_dim)
        self.motion_head = nn.Conv(
            (2 if self.vae else 1) * self.d_dim, (3, 3), padding=1)
        if self.downsample_motion:
            self.motion_down = [
                nn.Conv(self.hidden_dim, (3, 3), strides=2, padding=1,
                        name=f"motion_down_{i}")
                for i in range(self.motion_num_blocks)]
            self.up_motion_1 = nn.Dense(self.patch_nums[1])
            self.up_motion_2 = nn.Dense(self.patch_nums[1])

    # -- helpers ------------------------------------------------------------

    def _regularize(self, params_2c, sample_override):
        if not self.vae:
            # SymVid: deterministic latent, no KL (reference :1178-1208)
            return params_2c, jnp.float32(0.0)
        post = DiagonalGaussian(params_2c)
        do_sample = self.sample if sample_override is None else sample_override
        if do_sample:
            z = post.sample(self.make_rng("sample"))
        else:
            z = post.mode()
        kl = post.kl()
        return z, jnp.sum(kl) / kl.shape[0]

    # -- encode (reference :1434-1470) --------------------------------------

    def encode(self, x, sample_override: Optional[bool] = None):
        """x: [B,T,H,W,C] -> (z, u_S, u_Dx, u_Dy, reg_log)."""
        z = self.encoder(x)  # [B, F, H', W', C]
        b, f, hh, ww, c = z.shape

        z_q = z
        if self.shuffle_content:
            # per-sample random frame permutation (reference :1436-1442)
            rng = self.make_rng("sample")
            perms = jax.vmap(
                lambda k: jax.random.permutation(k, f))(
                jax.random.split(rng, b))
            z_q = jax.vmap(lambda zi, p: zi[p])(z, perms)
        pre_q = jnp.transpose(z_q, (0, 2, 3, 1, 4)).reshape(b * hh * ww, f, c)
        zc = self.qformer(pre_q)  # [(B H W), Fq, Cq]
        fq, cq = zc.shape[1], zc.shape[2]
        zc = zc.reshape(b, hh, ww, fq, cq)
        zc = jnp.transpose(zc, (0, 3, 1, 2, 4)).reshape(b * fq, hh, ww, cq)
        h = self.conv_in(zc)
        for blk in self.content_down:
            h = nn.relu(blk(h))
        h = self.bottle_down(h)  # [(B Fq), h, w, 2*expect_ch]
        h = h.reshape((b, fq) + h.shape[1:])
        u_s, kl_c = self._regularize(h, sample_override)

        u_dx, u_dy, kl_x, kl_y = self._motion_latent(z, sample_override)
        reg_log = {"kl_loss": kl_c + kl_x + kl_y}
        return z, u_s, u_dx, u_dy, reg_log

    def _motion_latent(self, z, sample_override):
        """[B,F,H',W',C] -> ([B,d,F,W'], [B,d,F,H'], kls)
        (reference get_motion_latent, :1460-1470)."""
        b, f, hh, ww, c = z.shape
        if self.downsample_motion:
            h = z.reshape(b * f, hh, ww, c)
            for blk in self.motion_down:
                h = nn.relu(blk(h))
            z = h.reshape((b, f) + h.shape[1:])
        ux = jnp.mean(z, axis=2)  # over H -> [B, F, W', C]
        uy = jnp.mean(z, axis=3)  # over W -> [B, F, H', C]
        zx = self.motion_head(ux)  # conv over (F, S) -> [B, F, S, 2d]
        zy = self.motion_head(uy)
        sx, kl_x = self._regularize(zx, sample_override)
        sy, kl_y = self._regularize(zy, sample_override)
        return (jnp.transpose(sx, (0, 3, 1, 2)),
                jnp.transpose(sy, (0, 3, 1, 2)), kl_x, kl_y)

    # -- decode (reference :1402-1432) --------------------------------------

    def _motion_embed(self, u):
        m = jnp.transpose(u, (0, 2, 3, 1))  # [B, F, S, d]
        m = nn.relu(self.motion_emb_1(m))
        m = nn.relu(self.motion_emb_2(m))
        return m

    def _up_motion(self, v, target):
        """Linear over the S axis (reference up_motion :1370-1373). The
        reference layers output patch_nums[1] (H' == W' assumed)."""
        m = jnp.swapaxes(v, 2, 3)  # [B, F, C, S]
        m = nn.relu(self.up_motion_1(m))
        m = nn.relu(self.up_motion_2(m))
        return jnp.swapaxes(m, 2, 3)

    def decode(self, u_s, u_dx, u_dy,
               spatial_hw: Optional[Tuple[int, int]] = None,
               only_part: Optional[str] = None,
               return_features: bool = False):
        """u_s: [B, Fq, h, w, expect_ch]; u_dx/u_dy: [B, d, F, S]."""
        hh = spatial_hw[0] if spatial_hw else self.patch_nums[1]
        ww = spatial_hw[1] if spatial_hw else self.patch_nums[2]
        b, fq = u_s.shape[0], u_s.shape[1]

        zc = u_s.reshape((b * fq,) + u_s.shape[2:])
        h = nn.relu(self.bottle_up(zc))
        for blk in self.content_up:
            h = nn.relu(blk(h))
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        zc = self.conv_out(h)  # [(B Fq), H, W, Cq]
        if zc.shape[1] > hh:
            border = (zc.shape[1] - hh) // 2
            zc = zc[:, border:border + hh, border:border + ww]
        cq = zc.shape[-1]
        zc = zc.reshape(b, fq, hh, ww, cq)
        zc = jnp.transpose(zc, (0, 2, 3, 1, 4)).reshape(b * hh * ww, fq, cq)
        h = nn.relu(self.cont_emb_dense(zc))
        h = nn.relu(self.cont_emb_mix(h))
        f = self.patch_nums[0]
        vt = h.reshape(b, hh, ww, f, self.hidden_dim)
        vt = jnp.transpose(vt, (0, 3, 1, 2, 4))  # [B, F, H, W, C]

        vx = self._motion_embed(u_dx)  # [B, F, S, C]
        vy = self._motion_embed(u_dy)
        if self.downsample_motion:
            vx = self._up_motion(vx, ww)
            vy = self._up_motion(vy, hh)
        vx_b = jnp.broadcast_to(vx[:, :, None], (b, f, hh, ww, self.hidden_dim))
        vy_b = jnp.broadcast_to(vy[:, :, :, None], (b, f, hh, ww, self.hidden_dim))

        part = only_part or (None if self.partial_content_motion == "all"
                             else self.partial_content_motion)
        if part == "content":
            cm = vt
        elif part == "motion":
            cm = vx_b + vy_b
        else:
            cm = vt + vx_b + vy_b
        return self.decoder(cm, return_features=return_features)

    # -- full forward -------------------------------------------------------

    def __call__(self, x, sample_override: Optional[bool] = None,
                 return_features: bool = False):
        z, u_s, u_dx, u_dy, reg_log = self.encode(x, sample_override)
        dec = self.decode(u_s, u_dx, u_dy,
                          spatial_hw=(z.shape[2], z.shape[3]),
                          return_features=return_features)
        if return_features:
            dec, pre = dec
            return z, dec, pre, reg_log, (u_s, u_dx, u_dy)
        return z, dec, reg_log, (u_s, u_dx, u_dy)


def build_vidtwin_from_config(model_cfg: dict):
    """Translate a reference vidtwin YAML model section. Dispatches the full
    ablation ladder by target class name (reference vidtwin_ae.py:282-1479);
    the shipped config's ``...CompactSymVidVAE`` is the default."""
    p = model_cfg.get("params", model_cfg)
    target = str(model_cfg.get("target", "")).rsplit(".", 1)[-1]
    enc = dict(p["encoder_config"].get("params") or {})
    dec = dict(p["decoder_config"].get("params") or {})

    def stt(cls, d):
        return cls(
            input_size=tuple(d.get("input_size", (16, 224, 224))),
            in_channels=d.get("in_channels", 3),
            patch_size=tuple(d.get("patch_size", (1, 16, 16))),
            hidden_size=d.get("hidden_size", 768),
            depth=d.get("depth", 16),
            num_heads=d.get("num_heads", 12),
            mlp_ratio=d.get("mlp_ratio", 4.0),
            temporal_causal=d.get("temporal_casual", True),
            temporal_group=d.get("temporal_group", False),
            group_size=d.get("group_size", 1),
            drop_path=d.get("drop_path", 0.0),
        )

    def qformer(key="temporal_qformer_config"):
        qf = dict((p.get(key) or {}).get("params") or {})
        return QFormerInterface(
            num_query_tokens=qf.get("num_query_tokens", 3),
            query_hidden_size=qf.get("query_hidden_size", 64),
            encoder_hidden_size=qf.get("encoder_hidden_size", 768),
            num_hidden_layers=qf.get("num_hidden_layers", 6),
            intermediate_size=qf.get("intermediate_size", 768),
            num_attention_heads=qf.get("num_attention_heads", 8),
        )

    encoder, decoder = stt(STTEncoder, enc), stt(STTDecoder, dec)
    meta = dict(kind="vidtwin", monitor=p.get("monitor"))

    if target == "VidAutoEncoderQformer":
        from .ablations import VidTwinQformer

        return VidTwinQformer(
            encoder=encoder, decoder=decoder,
            temporal_qformer=qformer(),
            height_qformer=qformer("height_qformer_config"),
            width_qformer=qformer("width_qformer_config"),
        ), meta
    if target == "VidAutoEncoderQformerCompact":
        from .ablations import VidTwinCompact

        return VidTwinCompact(
            encoder=encoder, decoder=decoder,
            temporal_qformer=qformer(), space_qformer=qformer(
                "space_qformer_config"),
            retain_num_frames=p.get("retain_num_frames", True),
            temporal_down_dim=p.get("temporal_down_dim", 32),
            repeat_for_decoder=p.get("repeat_for_decoder", False),
            partial_content_motion=p.get("partial_content_motion", "all"),
            shuffle_content=p.get("shuffle_content", False),
        ), meta
    if target in ("VidAutoEncoderQformerCompactSym",
                  "VidAutoEncoderQformerCompactSymDis"):
        from .ablations import VidTwinSym

        return VidTwinSym(
            encoder=encoder, decoder=decoder,
            temporal_qformer=qformer(), space_qformer=qformer(
                "space_qformer_config"),
            expect_ch=p.get("expect_ch", 4),
            init_ch=p.get("init_ch", 128),
            cont_num_blocks=p.get("cont_num_blocks", 2),
            retain_num_frames=p.get("retain_num_frames", True),
            partial_content_motion=p.get("partial_content_motion", "all"),
            shuffle_content=p.get("shuffle_content", False),
            dis=target.endswith("Dis"),
            shuffle_ratio=p.get("shuffle_content_ratio", 0.5),
        ), meta

    # SymVid (non-VAE) and the shipped SymVidVAE share the module; the
    # ``vae`` flag switches the gaussian heads off
    model = VidTwinVAE(
        encoder=encoder, decoder=decoder,
        qformer=qformer(),
        expect_ch=p.get("expect_ch", 4),
        d_dim=p.get("d_dim", 16),
        init_ch=p.get("init_ch", 128),
        cont_num_blocks=p.get("cont_num_blocks", 2),
        motion_num_blocks=p.get("motion_num_blocks", 2),
        downsample_motion=p.get("downsample_motion", False),
        shuffle_content=p.get("shuffle_content", False),
        vae=target != "VidAutoEncoderQformerCompactSymVid",
        partial_content_motion=p.get("partial_content_motion", "all"),
        sample=(p.get("regularizer_config", {}).get("params", {}) or {}).get(
            "sample", True),
    )
    return model, meta
