"""Generate golden parity fixtures from the PyTorch reference.

Imports the reference modules (read-only, /root/reference) as a numerical
oracle: builds randomly-initialized reference models, runs them on random
inputs, and saves (state_dict, input, outputs) npz fixtures under
tests/golden/. The JAX tests then convert the state_dict with
``convert_torch_state_dict`` and assert output parity — validating both the
architecture and the weight converter.

This script is a test-data generator only; no reference code is copied into
the framework.  Run:  python tools/gen_goldens.py
"""

import importlib.machinery
import os
import sys
import types

import numpy as np


def _mkmod(name):
    m = types.ModuleType(name)
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m

# ---- stub the reference's unavailable deps (beartype, lightning) ----------
bt = _mkmod("beartype")
bt.beartype = lambda f: f
bt_typing = _mkmod("beartype.typing")
import typing as _typing

bt_typing.Tuple = _typing.Tuple
bt_typing.Union = _typing.Union
bt.typing = bt_typing
sys.modules.setdefault("beartype", bt)
sys.modules.setdefault("beartype.typing", bt_typing)

lt = _mkmod("lightning")
lt_pt = _mkmod("lightning.pytorch")
lt_ut = _mkmod("lightning.pytorch.utilities")
lt_rz = _mkmod("lightning.pytorch.utilities.rank_zero")
lt_rz.rank_zero_only = lambda f: f
lt.pytorch = lt_pt
lt_pt.utilities = lt_ut
lt_ut.rank_zero = lt_rz
for name, mod in [
    ("lightning", lt),
    ("lightning.pytorch", lt_pt),
    ("lightning.pytorch.utilities", lt_ut),
    ("lightning.pytorch.utilities.rank_zero", lt_rz),
]:
    sys.modules.setdefault(name, mod)

REF = "/root/reference"
sys.path.insert(0, REF)

import torch  # noqa: E402

torch.manual_seed(0)

from vidtok.modules import model_3dcausal as m1  # noqa: E402
from vidtok.modules import model_3dcausal_v1_1 as m11  # noqa: E402
from vidtok.modules import model_3dnoncausal as mnc  # noqa: E402
from vidtok.modules import regularizers as refreg  # noqa: E402
from vidtok.modules.distributions import DiagonalGaussianDistribution  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden")
os.makedirs(OUT, exist_ok=True)


def small_cfg(**over):
    cfg = dict(
        double_z=True, z_channels=4, in_channels=3, out_ch=3, ch=32,
        ch_mult=[1, 2, 2], time_downsample_factor=4, num_res_blocks=1,
        dropout=0.0, norm_type="layernorm", tempo_ds=[0, 1], tempo_us=[1, 2],
    )
    cfg.update(over)
    return cfg


def save(name, sd, arrays):
    flat = {f"sd:{k}": v.detach().numpy() for k, v in sd.items()}
    flat.update({k: np.asarray(v) for k, v in arrays.items()})
    np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **flat)
    total = sum(a.nbytes for a in flat.values())
    print(f"  {name}: {len(flat)} arrays, {total/1e6:.2f} MB")


def randn(*shape, seed=0):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(*shape, generator=g)


def reinit(model, seed):
    """Re-randomize all parameters with a fixed seed (keeps zero-init convs
    nonzero-free? No — we want generic weights everywhere except keep
    mix_factor plausible). Zero-init temporal conv2 stays zero in reference
    init; we overwrite EVERYTHING with random values to make the parity test
    strict."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return model


def gen_encdec(name, enc_cls, dec_cls, cfg, T=5, H=32, W=32, seed=1):
    enc = reinit(enc_cls(**cfg).eval(), seed)
    dec = reinit(dec_cls(**cfg).eval(), seed + 100)
    x = randn(1, cfg["in_channels"], T, H, W, seed=seed + 7)
    with torch.no_grad():
        zp = enc(x)
        post = DiagonalGaussianDistribution(zp) if cfg["double_z"] else None
        z = post.mode() if post is not None else zp
        kl = None
        if post is not None:
            klv = post.kl()
            kl = (torch.sum(klv) / klv.shape[0]).item()
        dec_out = dec(z)
    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    arrays = dict(x=x.numpy(), zp=zp.numpy(), z=z.numpy(), dec=dec_out.numpy())
    if kl is not None:
        arrays["kl_loss"] = np.float64(kl)
    save(name, sd, arrays)


def gen_fsq():
    torch.manual_seed(3)
    reg = refreg.FSQRegularizer(
        levels=[8, 8, 8, 5, 5, 5], entropy_loss_weight=0.1,
        commitment_loss_weight=0.25, diversity_gamma=1.0,
    ).eval()
    z = randn(2, 6, 3, 4, 4, seed=11)  # [B, D, T, H, W]
    out, log = reg(z, n_steps=0)
    save("fsq_regularizer", reg.state_dict(), dict(
        z=z.numpy(), out=out.detach().numpy(),
        indices=log["indices"].numpy().astype(np.int64),
        aux_loss=np.float64(log["aux_loss"].item()),
    ))
    # annealing check
    reg2 = refreg.FSQRegularizer(
        levels=[8, 8, 8, 5, 5, 5], entropy_loss_weight=0.1,
        entropy_loss_annealing_steps=100, entropy_loss_annealing_factor=3.0,
        commitment_loss_weight=0.25,
    ).eval()
    out2, log2 = reg2(z, n_steps=40)
    save("fsq_annealing", {}, dict(
        z=z.numpy(), aux_loss=np.float64(log2["aux_loss"].item())))


def set_attr_all(model, attr, value):
    for m in model.modules():
        if hasattr(m, attr):
            setattr(m, attr, value)


def set_cache_offset(modules, offset):
    for mod in modules:
        for m in mod.modules():
            if hasattr(m, "cache_offset"):
                m.cache_offset = offset


def gen_v11_tiled():
    """Tiled streaming encode/decode with overlap — the v1.1 long-video path
    (orchestration mirrors reference autoencoder_v1_1.py:218-331)."""
    cfg = small_cfg(interpolation_mode="trilinear")
    enc = reinit(m11.EncoderCausal3DPadding(**cfg).eval(), 21)
    dec = reinit(m11.DecoderCausal3DPadding(**cfg).eval(), 22)
    T = 17
    t_chunk_enc, tdf = 8, 4
    t_chunk_dec = t_chunk_enc // tdf
    x = randn(1, 3, T, 32, 32, seed=23)

    def chunks(t, chunk):
        se = [[0, 1]]
        s = 1
        while s < t:
            e = min(t, s + chunk)
            se.append([s, e])
            s = e
        return se

    with torch.no_grad():
        # --- single-shot for comparison
        set_attr_all(enc, "causal_cache", None)
        set_attr_all(enc, "is_first_chunk", True)
        zp_full = enc(x)
        z_full = DiagonalGaussianDistribution(zp_full).mode()
        set_attr_all(dec, "causal_cache", None)
        set_attr_all(dec, "is_first_chunk", True)
        set_cache_offset([dec], 0)
        dec_full = dec(z_full)

        # --- tiled encode
        set_attr_all(enc, "causal_cache", None)
        zs = []
        for i, (s, e) in enumerate(chunks(T, t_chunk_enc)):
            set_attr_all(enc, "is_first_chunk", i == 0)
            zp = enc(x[:, :, s:e])
            zs.append(DiagonalGaussianDistribution(zp).mode())
        z_tiled = torch.cat(zs, dim=2)

        # --- tiled decode with overlap (tdf=4 offsets,
        #     reference autoencoder_v1_1.py:309-312)
        set_attr_all(dec, "causal_cache", None)
        set_cache_offset([dec], 1)
        set_cache_offset([dec.up_temporal[2].upsample, dec.up_temporal[1]], 2)
        set_cache_offset([dec.up_temporal[1].upsample, dec.up_temporal[0],
                          dec.conv_out], 4)
        outs = []
        tz = z_tiled.shape[2]
        for i, (s, e) in enumerate(chunks(tz, t_chunk_dec)):
            set_attr_all(dec, "is_first_chunk", i == 0)
            if e + 1 <= tz:
                out = dec(z_tiled[:, :, s : e + 1])
                out = out[:, :, :-tdf]
            else:
                out = dec(z_tiled[:, :, s:e])
            outs.append(out)
        dec_tiled = torch.cat(outs, dim=2)

    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    save("causal_v1_1_tiled", sd, dict(
        x=x.numpy(), z_full=z_full.numpy(), dec_full=dec_full.numpy(),
        z_tiled=z_tiled.numpy(), dec_tiled=dec_tiled.numpy(),
        t_chunk_enc=np.int64(t_chunk_enc),
    ))


def reinit_np(model, seed):
    """Like reinit() but draws from a numpy RandomState in
    named_parameters() order, so a test can regenerate the exact state_dict
    from (names, shapes, seed) without storing hundreds of MB of weights."""
    rs = np.random.RandomState(seed)
    names = []
    with torch.no_grad():
        for name, p in model.named_parameters():
            p.copy_(torch.from_numpy(
                (rs.randn(*p.shape) * 0.05).astype(np.float32)))
            names.append(name)
    return names


def gen_flagship():
    """Full-width parity fixture: ch=128, ch_mult [1,2,4,4], z=16 (the
    shipped kl_causal_488_16chn architecture) at 17x64x64. Weights are
    regenerated from a seeded numpy stream on the test side (122M params
    would be ~0.5 GB to store); the fixture carries only the parameter
    name/shape inventory + input + outputs."""
    cfg = small_cfg(ch=128, ch_mult=[1, 2, 4, 4], z_channels=16,
                    tempo_ds=[0, 1], tempo_us=[1, 2],
                    time_downsample_factor=4, norm_type="layernorm")
    enc = m1.EncoderCausal3DPadding(**cfg).eval()
    dec = m1.DecoderCausal3DPadding(**cfg).eval()
    enc_names = reinit_np(enc, 311)
    dec_names = reinit_np(dec, 312)
    x = randn(1, 3, 17, 64, 64, seed=313)
    with torch.no_grad():
        set_attr_all(enc, "causal_cache", None)
        set_attr_all(enc, "is_first_chunk", True)
        zp = enc(x)
        z = DiagonalGaussianDistribution(zp).mode()
        set_attr_all(dec, "causal_cache", None)
        set_attr_all(dec, "is_first_chunk", True)
        set_cache_offset([dec], 0)
        out = dec(z)
    arrays = dict(x=x.numpy(), zp=zp.numpy(), z=z.numpy(), dec=out.numpy(),
                  enc_names=np.array(enc_names), dec_names=np.array(dec_names))
    for name, p in list(enc.named_parameters()):
        arrays[f"eshape:{name}"] = np.array(p.shape, np.int64)
    for name, p in list(dec.named_parameters()):
        arrays[f"dshape:{name}"] = np.array(p.shape, np.int64)
    save("flagship_kl16", {}, arrays)


def gen_v11_long():
    """BASELINE config-#4 protocol: 129-frame v1.1 video, chunk_size 16,
    tdf=4, tiled encode + tiled decode in BOTH overlap modes (reference
    autoencoder_v1_1.py:218-331)."""
    cfg = small_cfg(interpolation_mode="trilinear")
    enc = reinit(m11.EncoderCausal3DPadding(**cfg).eval(), 41)
    dec = reinit(m11.DecoderCausal3DPadding(**cfg).eval(), 42)
    T, t_chunk_enc, tdf = 129, 16, 4
    t_chunk_dec = t_chunk_enc // tdf
    x = randn(1, 3, T, 32, 32, seed=43)

    def chunks(t, chunk):
        se = [[0, 1]]
        s = 1
        while s < t:
            e = min(t, s + chunk)
            se.append([s, e])
            s = e
        return se

    with torch.no_grad():
        # tiled encode (chunk 16)
        set_attr_all(enc, "causal_cache", None)
        zs = []
        for i, (s, e) in enumerate(chunks(T, t_chunk_enc)):
            set_attr_all(enc, "is_first_chunk", i == 0)
            zp = enc(x[:, :, s:e])
            zs.append(DiagonalGaussianDistribution(zp).mode())
        z_tiled = torch.cat(zs, dim=2)
        tz = z_tiled.shape[2]

        # tiled decode WITHOUT overlap (use_overlap=False path)
        set_attr_all(dec, "causal_cache", None)
        set_cache_offset([dec], 0)
        outs = []
        for i, (s, e) in enumerate(chunks(tz, t_chunk_dec)):
            set_attr_all(dec, "is_first_chunk", i == 0)
            outs.append(dec(z_tiled[:, :, s:e]))
        dec_plain = torch.cat(outs, dim=2)

        # tiled decode WITH overlap (tdf=4 cache offsets,
        # reference :309-316)
        set_attr_all(dec, "causal_cache", None)
        set_cache_offset([dec], 1)
        set_cache_offset([dec.up_temporal[2].upsample, dec.up_temporal[1]], 2)
        set_cache_offset([dec.up_temporal[1].upsample, dec.up_temporal[0],
                          dec.conv_out], 4)
        outs = []
        for i, (s, e) in enumerate(chunks(tz, t_chunk_dec)):
            set_attr_all(dec, "is_first_chunk", i == 0)
            if e + 1 <= tz:
                out = dec(z_tiled[:, :, s:e + 1])[:, :, :-tdf]
            else:
                out = dec(z_tiled[:, :, s:e])
            outs.append(out)
        dec_overlap = torch.cat(outs, dim=2)

    sd = {f"encoder.{k}": v for k, v in enc.state_dict().items()}
    sd.update({f"decoder.{k}": v for k, v in dec.state_dict().items()})
    save("causal_v1_1_long129", sd, dict(
        x=x.numpy(), z_tiled=z_tiled.numpy(),
        dec_plain=dec_plain.numpy(), dec_overlap=dec_overlap.numpy(),
        t_chunk_enc=np.int64(t_chunk_enc),
    ))


def gen_metrics():
    from vidtok.modules import util as refutil

    x = torch.rand(2, 3, 4, 64, 64, generator=torch.Generator().manual_seed(5))
    y = torch.clamp(x + 0.1 * randn(2, 3, 4, 64, 64, seed=6), 0, 1)
    psnr = refutil.compute_psnr(x, y).item()
    ssim = refutil.compute_ssim(x, y).item()
    # 600px: triggers the auto-downscale (f=2) path in compute_ssim
    x2 = torch.rand(1, 3, 2, 600, 600, generator=torch.Generator().manual_seed(7))
    y2 = torch.clamp(x2 + 0.05 * randn(1, 3, 2, 600, 600, seed=8), 0, 1)
    psnr2 = refutil.compute_psnr(x2, y2).item()
    ssim2 = refutil.compute_ssim(x2, y2).item()
    # per-channel + complex SSIM variants (util.py:181-302; unused by the
    # reference's own scripts but part of its metric surface)
    xf = x[:, :, 0]
    yf = y[:, :, 0]
    kernel = refutil.gaussian_filter(
        11, 1.5, dtype=torch.float32).repeat(xf.size(1), 1, 1, 1)
    ss_pc, cs_pc = refutil._ssim_per_channel(xf, yf, kernel)
    xc = torch.stack([xf, yf], dim=-1)
    yc = torch.stack([torch.clamp(yf + 0.05, 0, 1), xf], dim=-1)
    ss_cx, cs_cx = refutil._ssim_per_channel_complex(xc, yc, kernel)
    save("metrics", {}, dict(
        x=x.numpy(), y=y.numpy(), psnr=np.float64(psnr), ssim=np.float64(ssim),
        x2=x2.numpy(), y2=y2.numpy(), psnr2=np.float64(psnr2),
        ssim2=np.float64(ssim2),
        ss_pc=ss_pc.numpy(), cs_pc=cs_pc.numpy(),
        xc=xc.numpy(), yc=yc.numpy(),
        ss_cx=ss_cx.numpy(), cs_cx=cs_cx.numpy(),
    ))


def gen_discriminators():
    from vidtok.modules import discriminator as refdisc

    torch.manual_seed(13)
    d2 = refdisc.NLayerDiscriminator(input_nc=3, n_layers=3,
                                     use_actnorm=False).apply(
        refdisc.weights_init).eval()
    # randomize BN running stats so eval-mode parity is a real test
    with torch.no_grad():
        for m in d2.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=torch.Generator().manual_seed(5)) * 0.1)
                m.running_var.copy_(1 + 0.1 * torch.rand(m.running_var.shape,
                                                         generator=torch.Generator().manual_seed(6)))
    x2 = randn(2, 3, 64, 64, seed=14)
    with torch.no_grad():
        y2 = d2(x2)
    d3 = refdisc.NLayerDiscriminator3D(input_nc=3, n_layers=3,
                                       use_actnorm=False).apply(
        refdisc.weights_init).eval()
    x3 = randn(1, 3, 8, 64, 64, seed=15)
    with torch.no_grad():
        y3 = d3(x3)
    sd = {f"loss.discriminator.{k}": v for k, v in d2.state_dict().items()}
    sd.update({f"loss.discriminator3d.{k}": v
               for k, v in d3.state_dict().items()})
    save("discriminators", sd, dict(x2=x2.numpy(), y2=y2.numpy(),
                                    x3=x3.numpy(), y3=y3.numpy()))


def gen_full_ckpt():
    """A complete Lightning-layout checkpoint: encoder/decoder/regularizer
    + loss.logvar + loss.discriminator + model_ema shadows, with the EMA
    advanced past init so shadows differ numerically from the live params.
    Key layout matches the reference AutoencodingEngine
    (autoencoder.py:69-117: self.encoder/decoder/regularization/loss,
    self.model_ema = LitEma(self)); exercises tools/convert_ckpt.py."""
    from vidtok.modules import discriminator as refdisc
    from vidtok.modules.ema import LitEma

    cfg = small_cfg(ch_mult=[1, 2], tempo_ds=[0], tempo_us=[1],
                    time_downsample_factor=2)
    full = torch.nn.Module()
    full.encoder = reinit(m1.EncoderCausal3DPadding(**cfg), 31)
    full.decoder = reinit(m1.DecoderCausal3DPadding(**cfg), 32)
    full.regularization = refreg.DiagonalGaussianRegularizer()
    full.loss = torch.nn.Module()
    full.loss.logvar = torch.nn.Parameter(torch.tensor(0.123))
    full.loss.discriminator = reinit(
        refdisc.NLayerDiscriminator3D(input_nc=3, n_layers=2,
                                      use_actnorm=False), 33)
    full.model_ema = LitEma(full, decay=0.99)
    # advance: perturb params, step the EMA twice -> shadows != params
    with torch.no_grad():
        for p in full.parameters():
            p.add_(0.01 * torch.randn(p.shape,
                                      generator=torch.Generator().manual_seed(34)))
    full.model_ema(full)
    full.model_ema(full)
    save("full_ckpt", full.state_dict(), {})


def gen_actnorm():
    """ActNorm: standalone (data-init + logdet) and inside the 2D PatchGAN
    (reference discriminator.py:16-85, use_actnorm path :99-106)."""
    from vidtok.modules import discriminator as refdisc

    # standalone: train-mode forward triggers the data-dependent init,
    # second (eval) forward on a different batch uses the frozen params
    an = refdisc.ActNorm(16, logdet=True).train()
    x_init = randn(4, 16, 8, 8, seed=40)
    with torch.no_grad():
        an(x_init)
    an = an.eval()
    x_eval = randn(4, 16, 8, 8, seed=41)
    with torch.no_grad():
        y_eval, logdet = an(x_eval)

    torch.manual_seed(42)
    d2 = refdisc.NLayerDiscriminator(input_nc=3, n_layers=3,
                                     use_actnorm=True).apply(
        refdisc.weights_init).train()
    xd_init = randn(2, 3, 64, 64, seed=43)
    with torch.no_grad():
        d2(xd_init)  # initializes every ActNorm from this batch
    d2 = d2.eval()
    xd = randn(2, 3, 64, 64, seed=44)
    with torch.no_grad():
        yd = d2(xd)

    sd = {f"an.{k}": v for k, v in an.state_dict().items()}
    sd.update({f"loss.discriminator.{k}": v for k, v in d2.state_dict().items()})
    save("actnorm", sd, dict(
        x_init=x_init.numpy(), x_eval=x_eval.numpy(), y_eval=y_eval.numpy(),
        logdet=logdet.numpy(), xd_init=xd_init.numpy(), xd=xd.numpy(),
        yd=yd.numpy()))


def _install_vidtwin_stubs():
    """timm / omegaconf / losses stubs so the reference vidtwin modules
    import without their GPU-era deps."""
    import torch.nn as tnn

    timm = _mkmod("timm")
    timm_m = _mkmod("timm.models")
    timm_l = _mkmod("timm.models.layers")
    timm_v = _mkmod("timm.models.vision_transformer")

    class DropPath(tnn.Module):
        def __init__(self, p=0.0):
            super().__init__()

        def forward(self, x):
            return x

    class Mlp(tnn.Module):
        def __init__(self, in_features, hidden_features, act_layer, drop=0.0):
            super().__init__()
            self.fc1 = tnn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = tnn.Linear(hidden_features, in_features)

        def forward(self, x):
            return self.fc2(self.act(self.fc1(x)))

    timm_l.DropPath = DropPath
    timm_v.Mlp = Mlp
    timm.models = timm_m
    timm_m.layers = timm_l
    timm_m.vision_transformer = timm_v
    for n, m in [("timm", timm), ("timm.models", timm_m),
                 ("timm.models.layers", timm_l),
                 ("timm.models.vision_transformer", timm_v)]:
        sys.modules.setdefault(n, m)

    oc = _mkmod("omegaconf")

    class ListConfig(list):
        pass

    oc.ListConfig = ListConfig
    sys.modules.setdefault("omegaconf", oc)

    # LightningModule stub for the model base class
    import lightning.pytorch as lpt

    if not hasattr(lpt, "LightningModule"):
        lpt.LightningModule = tnn.Module


class AttrDict(dict):
    """dict with attribute access (OmegaConf-style, for reference configs)."""

    def __getattr__(self, k):
        v = self[k]
        return AttrDict(v) if isinstance(v, dict) else v


def gen_vidtwin():
    _install_vidtwin_stubs()
    # stub vidtok.modules.losses so the Lightning class can instantiate its
    # loss without torchvision/LPIPS downloads
    losses_stub = _mkmod("vidtok.modules.losses")

    class GeneralLPIPSWithDiscriminator(torch.nn.Module):
        def __init__(self, **kwargs):
            super().__init__()

    losses_stub.GeneralLPIPSWithDiscriminator = GeneralLPIPSWithDiscriminator
    sys.modules["vidtok.modules.losses"] = losses_stub

    from vidtwin.models import vidtwin_ae as vta
    from vidtwin.modules import st_transformer as stt
    from vidtwin.modules import qformer as qf

    enc_cfg = AttrDict(target="vidtwin.modules.st_transformer.STTEncoder",
                       params=AttrDict(in_channels=3, input_size=[4, 32, 32],
                                       patch_size=[1, 8, 8], hidden_size=64,
                                       depth=2, num_heads=4,
                                       temporal_casual=False,
                                       enable_flashattn=False))
    dec_cfg = AttrDict(target="vidtwin.modules.st_transformer.STTDecoder",
                       params=AttrDict(in_channels=3, input_size=[4, 32, 32],
                                       patch_size=[1, 8, 8], hidden_size=64,
                                       depth=2, num_heads=4,
                                       temporal_casual=False,
                                       enable_flashattn=False))
    q_cfg = AttrDict(target="vidtwin.modules.qformer.MyQformerInterface",
                     params=AttrDict(num_query_tokens=4, query_hidden_size=32,
                                     encoder_hidden_size=64))
    reg_cfg = AttrDict(target="vidtok.modules.regularizers.DiagonalGaussianRegularizer",
                       params=AttrDict(sample=False))
    loss_cfg = AttrDict(target="vidtok.modules.losses.GeneralLPIPSWithDiscriminator",
                        params=AttrDict())

    # The reference STBlock hard-casts through fp64/bf16
    # (st_transformer.py:336-362), which cannot run on CPU with fp32
    # weights. Neutralize the casts to fp32 so the oracle captures the pure
    # math; our JAX model's bf16-attention policy is tested separately.
    _orig_to = torch.Tensor.to

    def _to32(self, *args, **kwargs):
        args = tuple(torch.float32 if a in (torch.float64, torch.bfloat16)
                     else a for a in args)
        if kwargs.get("dtype") in (torch.float64, torch.bfloat16):
            kwargs["dtype"] = torch.float32
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to32

    torch.manual_seed(7)
    model = vta.VidAutoEncoderQformerCompactSymVidVAE(
        encoder_config=enc_cfg, decoder_config=dec_cfg, loss_config=loss_cfg,
        regularizer_config=reg_cfg, temporal_qformer_config=q_cfg,
        expect_ch=8, cont_num_blocks=1, downsample_motion=True,
        motion_num_blocks=1, d_dim=8, init_ch=16,
    ).eval()
    reinit(model, 71)

    x = randn(2, 3, 4, 32, 32, seed=72)
    with torch.no_grad():
        z, z_content, z_mx, z_my, reg_log = model.encode(x, return_reg_log=True)
        dec = model.decode(z, z_content, z_mx, z_my)
        dec_content = model.decode(z, z_content, z_mx, z_my, only_part="content")
        # submodule goldens
        z_enc = model.encoder(x)
        dec_direct = model.decoder(z_enc)
        qin = randn(3, 4, 64, seed=73)
        q_out = model.temporal_qformer(qin)
    torch.Tensor.to = _orig_to
    save("vidtwin", model.state_dict(), dict(
        x=x.numpy(), z=z.numpy(), z_content=z_content.numpy(),
        z_mx=z_mx.numpy(), z_my=z_my.numpy(),
        kl_loss=np.float64(reg_log["kl_loss"].item()),
        dec=dec.numpy(), dec_content=dec_content.numpy(),
        z_enc=z_enc.numpy(), dec_direct=dec_direct.numpy(),
        qin=qin.numpy(), q_out=q_out.numpy(),
    ))


def _neutral_casts():
    """Neutralize the reference STBlock's fp64/bf16 cast dance for CPU
    oracles (see gen_vidtwin); returns the original Tensor.to."""
    _orig_to = torch.Tensor.to

    def _to32(self, *args, **kwargs):
        args = tuple(torch.float32 if a in (torch.float64, torch.bfloat16)
                     else a for a in args)
        if kwargs.get("dtype") in (torch.float64, torch.bfloat16):
            kwargs["dtype"] = torch.float32
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to32
    return _orig_to


def gen_vidtwin_ablations():
    """Parity fixtures for the VidTwin ablation ladder (reference
    vidtwin_ae.py:282-1216): Qformer (3-qformer), Compact (both
    retain/repeat head variants), Sym, SymVid."""
    _install_vidtwin_stubs()
    losses_stub = _mkmod("vidtok.modules.losses")

    class GeneralLPIPSWithDiscriminator(torch.nn.Module):
        def __init__(self, **kwargs):
            super().__init__()

    losses_stub.GeneralLPIPSWithDiscriminator = GeneralLPIPSWithDiscriminator
    sys.modules.setdefault("vidtok.modules.losses", losses_stub)

    from vidtwin.models import vidtwin_ae as vta

    def stt_cfg(cls):
        return AttrDict(target=f"vidtwin.modules.st_transformer.{cls}",
                        params=AttrDict(in_channels=3, input_size=[4, 32, 32],
                                        patch_size=[1, 8, 8], hidden_size=64,
                                        depth=2, num_heads=4,
                                        temporal_casual=False,
                                        enable_flashattn=False))

    def q_cfg(tokens, qh=32):
        return AttrDict(target="vidtwin.modules.qformer.MyQformerInterface",
                        params=AttrDict(num_query_tokens=tokens,
                                        query_hidden_size=qh,
                                        encoder_hidden_size=64))

    reg_cfg = AttrDict(
        target="vidtok.modules.regularizers.DiagonalGaussianRegularizer",
        params=AttrDict(sample=False))
    loss_cfg = AttrDict(
        target="vidtok.modules.losses.GeneralLPIPSWithDiscriminator",
        params=AttrDict())
    common = dict(encoder_config=stt_cfg("STTEncoder"),
                  decoder_config=stt_cfg("STTDecoder"),
                  loss_config=loss_cfg, regularizer_config=reg_cfg)

    _orig_to = _neutral_casts()
    x = randn(2, 3, 4, 32, 32, seed=82)

    def run(name, model, n_latents):
        model = reinit(model.eval(), 81)
        with torch.no_grad():
            out = model(x)
        z, dec = out[0], out[1]
        latents = out[3:3 + n_latents]
        save(name, model.state_dict(), dict(
            x=x.numpy(), z=z.numpy(), dec=dec.numpy(),
            **{f"lat{i}": l.numpy() for i, l in enumerate(latents)}))

    torch.manual_seed(9)
    run("vidtwin_abl_qformer", vta.VidAutoEncoderQformer(
        temporal_qformer_config=q_cfg(4),
        height_qformer_config=q_cfg(2),
        width_qformer_config=q_cfg(2), **common), 3)
    torch.manual_seed(10)
    run("vidtwin_abl_compact", vta.VidAutoEncoderQformerCompact(
        temporal_qformer_config=q_cfg(4), space_qformer_config=q_cfg(3),
        temporal_down_dim=8, retain_num_frames=True,
        repeat_for_decoder=False, **common), 2)
    torch.manual_seed(11)
    run("vidtwin_abl_compact_alt", vta.VidAutoEncoderQformerCompact(
        temporal_qformer_config=q_cfg(4), space_qformer_config=q_cfg(3),
        temporal_down_dim=8, retain_num_frames=False,
        repeat_for_decoder=True, **common), 2)
    torch.manual_seed(12)
    run("vidtwin_abl_sym", vta.VidAutoEncoderQformerCompactSym(
        temporal_qformer_config=q_cfg(4), space_qformer_config=q_cfg(3),
        init_ch=16, cont_num_blocks=1, expect_ch=8,
        retain_num_frames=True, **common), 2)
    torch.manual_seed(13)
    run("vidtwin_abl_symvid", vta.VidAutoEncoderQformerCompactSymVid(
        temporal_qformer_config=q_cfg(4), expect_ch=8, cont_num_blocks=1,
        downsample_motion=True, motion_num_blocks=1, d_dim=8, init_ch=16,
        **common), 3)
    torch.Tensor.to = _orig_to


def gen_lr_schedules():
    """LR traces of the reference VidTwin schedulers
    (vidtwin_ae.py:1504-1567) + HF inverse_sqrt, recorded per training
    step, as parity oracles for vidtok_tpu/models/vidtwin/schedules.py."""
    _install_vidtwin_stubs()
    losses_stub = _mkmod("vidtok.modules.losses")
    losses_stub.GeneralLPIPSWithDiscriminator = torch.nn.Module
    sys.modules.setdefault("vidtok.modules.losses", losses_stub)

    from vidtwin.models import vidtwin_ae as vta

    total, n = 200, 200

    def trace(make):
        p = torch.nn.Parameter(torch.zeros(1))
        values = []
        opt = torch.optim.SGD([p], lr=1.0)
        sched = make(opt)
        for i in range(n):
            values.append(opt.param_groups[0]["lr"])
            if i < n - 1:  # reference ConstantWarmup has no lr past total
                opt.step()
                sched.step()
        return np.asarray(values, np.float64)

    arrays = dict(
        linear=trace(lambda o: vta.LinearWarmupScheduler(
            o, warmup_steps=20, total_steps=total, target_lr=3e-4)),
        constant=trace(lambda o: vta.ConstantWarmupScheduler(
            o, warmup_steps=20, total_steps=total)),
        cosine=trace(lambda o: vta.LambdaWarmUpCosineScheduler(
            o, lr_min=1e-6, lr_max=2e-4, lr_start=1e-8,
            warmup_steps=25, total_steps=total)),
        cosine_rate=trace(lambda o: vta.LambdaWarmUpCosineScheduler(
            o, lr_min=0.0, lr_max=1e-4, lr_start=0.0,
            warmup_rate=0.1, total_steps=total)),
    )
    try:
        import transformers

        arrays["inverse_sqrt"] = trace(
            lambda o: transformers.get_inverse_sqrt_schedule(
                o, num_warmup_steps=30))
    except Exception:
        pass
    save("lr_schedules", {}, arrays)


def _install_tv_stub():
    """torchvision is unavailable here: stub ``torchvision.models.vgg16``
    with the standard VGG16 'features' Sequential (identical module layout
    and state-dict keys) under seeded RANDOM weights, and patch the
    reference LPIPS's vgg.pth download away. Returns a holder dict that
    captures the torchvision-style features state dict on each vgg16()
    call. Shared by gen_lpips and gen_loss_stack."""
    tv = _mkmod("torchvision")
    tvm = _mkmod("torchvision.models")

    def _make_features():
        plan = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                512, 512, 512, "M", 512, 512, 512, "M"]
        layers, cin = [], 3
        for v in plan:
            if v == "M":
                layers.append(torch.nn.MaxPool2d(2, 2))
            else:
                layers.append(torch.nn.Conv2d(cin, v, 3, padding=1))
                layers.append(torch.nn.ReLU(inplace=True))
                cin = v
        return torch.nn.Sequential(*layers)

    holder = {}

    class _VGG(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _make_features()

    def vgg16(pretrained=True, **kw):
        m = _VGG()
        g = torch.Generator().manual_seed(1234)
        with torch.no_grad():
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        holder["features_sd"] = {k: v.clone()
                                 for k, v in m.features.state_dict().items()}
        return m

    tvm.vgg16 = vgg16
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm

    from vidtok.modules import lpips as reflp

    reflp.LPIPS.load_from_pretrained = lambda self, name="vgg_lpips": None
    return holder


def _seed_lin_heads(lpips_model, seed=77):
    """Seeded positive lin-head weights (shared recipe)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for k in range(5):
            w = getattr(lpips_model, f"lin{k}").model[1].weight
            w.copy_(torch.rand(w.shape, generator=g))  # positive heads


def gen_lpips():
    """LPIPS numerical-parity fixture (reference lpips.py:61-172).

    The fixture carries the exact tensors the real conversion flow would
    see: a torchvision-style features state dict + lin-head state dict +
    input pair + the reference LPIPS distance. The JAX test pushes the
    state dicts through tools/convert_lpips.convert() and asserts distance
    parity — validating module AND converter, so real weights drop in
    unchanged when available.
    """
    holder = _install_tv_stub()
    from vidtok.modules import lpips as reflp

    model = reflp.LPIPS(use_dropout=True).eval()
    _seed_lin_heads(model)

    x = (randn(4, 3, 64, 64, seed=3) * 0.4).clamp(-1, 1)
    y = (x + randn(4, 3, 64, 64, seed=4) * 0.15).clamp(-1, 1)
    with torch.no_grad():
        dist = model(x, y)

    sd = {f"features.{k}": v for k, v in holder["features_sd"].items()}
    sd.update({k: v for k, v in model.state_dict().items()
               if k.startswith("lin")})
    save("lpips", sd, dict(x=x.numpy(), y=y.numpy(), dist=dist.numpy()))


def gen_loss_stack():
    """Value-level golden for the FULL training loss stack (VERDICT r4 #2).

    Runs the reference GeneralLPIPSWithDiscriminator (losses.py:73-262) end
    to end on a tiny seeded model: encoder -> KL regularizer (mode) ->
    decoder -> both optimizer_idx paths at a pre-disc-start and a
    post-disc-start global step, with the autograd adaptive d_weight
    (losses.py:137-148) differentiating through the live decoder graph and
    the LeCAM EMA (losses.py:54-70) reset to 0 before each disc step.

    Two cases cover every loss branch:
      2d:  CE gen loss + hinge + lecam + learn_logvar (flagship recipe)
      3d:  -mean(logits) gen loss + vanilla + no lecam

    Deliberate divergence captured here: the discriminator runs in train
    mode (BN batch stats — Lightning train()), but perceptual_loss stays
    eval (no lin-head dropout). The reference's model.train() would also
    re-enable LPIPS dropout; our JAX loss is deterministic, matching eval.
    """
    holder = _install_tv_stub()
    from vidtok.modules import losses as reflosses

    cfg = small_cfg()
    enc = reinit(m1.EncoderCausal3DPadding(**cfg).eval(), 21)
    dec = reinit(m1.DecoderCausal3DPadding(**cfg).eval(), 121)
    reg = refreg.DiagonalGaussianRegularizer(sample=False)

    x = (randn(2, 3, 5, 32, 32, seed=5) * 0.4).clamp(-1, 1)
    zp = enc(x)                      # grad-enabled: the adaptive d_weight
    z, reg_log = reg(zp)             # autograds through this graph
    xrec = dec(z)
    last_layer = dec.get_last_layer()  # conv_out.conv.weight

    base_sd = {f"encoder.{k}": v.clone() for k, v in enc.state_dict().items()}
    base_sd.update({f"decoder.{k}": v.clone()
                    for k, v in dec.state_dict().items()})

    cases = {
        "2d": dict(dims=3, disc_start=6, disc_weight=0.2, disc_type="2d",
                   learn_logvar=True, gen_loss_cross_entropy=True,
                   lecam_loss_weight=0.005, disc_loss="hinge",
                   logvar_init=0.3, perceptual_weight=1.0,
                   regularization_weights={"kl_loss": 1e-4}),
        "3d": dict(dims=3, disc_start=6, disc_weight=0.7, disc_type="3d",
                   learn_logvar=False, gen_loss_cross_entropy=False,
                   lecam_loss_weight=0.0, disc_loss="vanilla",
                   logvar_init=0.0, perceptual_weight=1.0,
                   regularization_weights={"kl_loss": 1e-4}),
    }
    for name, kw in cases.items():
        torch.manual_seed(31)
        loss = reflosses.GeneralLPIPSWithDiscriminator(**kw)
        # wider-than-reinit disc weights: keeps the g_loss grads large
        # enough that d_weight comes off the 1e4 clamp — the norm-ratio
        # math (losses.py:137-148) is only tested when unclamped
        g = torch.Generator().manual_seed(41)
        with torch.no_grad():
            for p in loss.discriminator.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.3)
        _seed_lin_heads(loss.perceptual_loss)
        loss.discriminator.train()
        loss.perceptual_loss.eval()

        sd = dict(base_sd)
        sd.update({f"loss.discriminator.{k}": v.clone()
                   for k, v in loss.discriminator.state_dict().items()})
        sd.update({f"lpips.features.{k}": v.clone()
                   for k, v in holder["features_sd"].items()})
        sd.update({f"lpips.{k}": v.clone()
                   for k, v in loss.perceptual_loss.state_dict().items()
                   if k.startswith("lin")})

        arrays = dict(x=x.detach().numpy(), z=z.detach().numpy(),
                      xrec=xrec.detach().numpy(),
                      kl_loss=reg_log["kl_loss"].item(),
                      logvar=loss.logvar.item())
        for gstep in (0, 10):
            l0, log0 = loss(reg_log, x, xrec, 0, gstep,
                            last_layer=last_layer)
            arrays[f"g{gstep}_aeloss"] = float(l0)
            for k, v in log0.items():
                arrays[f"g{gstep}_{k.split('/')[-1]}"] = float(v)
            if loss.lecam_loss_weight > 0:
                loss.lecam_ema.logits_real_ema = 0.0
                loss.lecam_ema.logits_fake_ema = 0.0
            l1, log1 = loss(reg_log, x, xrec, 1, gstep)
            arrays[f"g{gstep}_discloss"] = float(l1)
            for k, v in log1.items():
                arrays[f"g{gstep}_{k.split('/')[-1]}"] = float(v)
            if loss.lecam_loss_weight > 0:
                arrays[f"g{gstep}_lecam_real"] = loss.lecam_ema.logits_real_ema
                arrays[f"g{gstep}_lecam_fake"] = loss.lecam_ema.logits_fake_ema
        save(f"loss_stack_{name}", sd, arrays)


def main():
    print("generating goldens ->", OUT)
    gen_encdec("causal_v1_kl", m1.EncoderCausal3DPadding,
               m1.DecoderCausal3DPadding, small_cfg())
    gen_encdec("causal_v1_groupnorm", m1.EncoderCausal3DPadding,
               m1.DecoderCausal3DPadding,
               small_cfg(ch=64, ch_mult=[1, 2], tempo_ds=[0], tempo_us=[1],
                         norm_type="groupnorm", time_downsample_factor=2))
    gen_encdec("causal_v1_1_kl", m11.EncoderCausal3DPadding,
               m11.DecoderCausal3DPadding,
               small_cfg(interpolation_mode="trilinear"))
    gen_encdec("noncausal_kl", mnc.Encoder3D, mnc.Decoder3D,
               small_cfg(), T=8)
    gen_encdec("causal_v1_tdf8", m1.EncoderCausal3DPadding,
               m1.DecoderCausal3DPadding,
               small_cfg(ch_mult=[1, 2, 2, 2], tempo_ds=[0, 1, 2],
                         tempo_us=[1, 2, 3], time_downsample_factor=8),
               T=9)
    gen_encdec("fsq_model", m1.EncoderCausal3DPadding,
               m1.DecoderCausal3DPadding,
               small_cfg(double_z=False, z_channels=6))
    # 444-style: spatial downsample restricted to a level subset
    gen_encdec("causal_v1_444", m1.EncoderCausal3DPadding,
               m1.DecoderCausal3DPadding,
               small_cfg(ch_mult=[1, 2, 2], spatial_ds=[1], spatial_us=[1],
                         tempo_ds=[1], tempo_us=[1],
                         time_downsample_factor=2))
    gen_fsq()
    gen_lpips()
    gen_loss_stack()
    gen_v11_tiled()
    gen_flagship()
    gen_v11_long()
    gen_metrics()
    gen_vidtwin()
    gen_vidtwin_ablations()
    gen_lr_schedules()
    gen_discriminators()
    gen_actnorm()
    gen_full_ckpt()
    print("done")


if __name__ == "__main__":
    main()
