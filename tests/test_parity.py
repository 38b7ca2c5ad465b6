"""Numerical parity vs the PyTorch reference (golden fixtures).

Each case builds the reference model with random weights (tools/
gen_goldens.py), converts the state_dict through our torch->flax converter,
runs the same input through the TPU-native model, and asserts output parity.
This validates architecture semantics AND the weight converter together —
so the released VidTok checkpoints load correctly by construction.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vidtok_tpu.models.autoencoder import TokenizerCore, build_core_from_config
from vidtok_tpu.utils.checkpoint import convert_torch_state_dict, validate_params
from tests.golden_utils import load_golden

TOL = dict(atol=2e-4, rtol=2e-3)


def small_cfg(**over):
    cfg = dict(
        double_z=True, z_channels=4, in_channels=3, out_ch=3, ch=32,
        ch_mult=[1, 2, 2], time_downsample_factor=4, num_res_blocks=1,
        dropout=0.0, norm_type="layernorm", tempo_ds=[0, 1], tempo_us=[1, 2],
    )
    cfg.update(over)
    return cfg


def make_core(enc_target, dec_target, cfg, reg=None):
    model_cfg = {"params": {
        "encoder_config": {"target": enc_target, "params": dict(cfg)},
        "decoder_config": {"target": dec_target, "params": dict(cfg)},
        "regularizer_config": reg or {"target": "DiagonalGaussianRegularizer"},
    }}
    return build_core_from_config(model_cfg)


def init_params(core, cfg, T, H=32, W=32):
    x = jnp.zeros((1, T, H, W, cfg["in_channels"]), jnp.float32)
    variables = core.init(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)},
        x, sample_override=False)
    return variables["params"]


def to_nthwc(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))


def to_ncthw(x):
    return np.transpose(np.asarray(x), (0, 4, 1, 2, 3))


def check_convert(core, cfg, sd, T, H=32, W=32):
    params = convert_torch_state_dict(sd)
    ref_params = init_params(core, cfg, T, H, W)
    missing, unexpected, mismatched = validate_params(params, ref_params)
    assert not missing, f"missing: {missing[:10]}"
    assert not unexpected, f"unexpected: {unexpected[:10]}"
    assert not mismatched, f"mismatched: {mismatched[:10]}"
    return jax.tree_util.tree_map(jnp.asarray, params)


ENCDEC_CASES = [
    ("causal_v1_kl", "EncoderCausal3D", "DecoderCausal3D", {}, 5),
    ("causal_v1_groupnorm", "EncoderCausal3D", "DecoderCausal3D",
     dict(ch=64, ch_mult=[1, 2], tempo_ds=[0], tempo_us=[1],
          norm_type="groupnorm", time_downsample_factor=2), 5),
    ("causal_v1_1_kl", "EncoderCausal3DV1_1", "DecoderCausal3DV1_1",
     dict(interpolation_mode="trilinear"), 5),
    ("noncausal_kl", "Encoder3D", "Decoder3D", {}, 8),
    ("causal_v1_tdf8", "EncoderCausal3D", "DecoderCausal3D",
     dict(ch_mult=[1, 2, 2, 2], tempo_ds=[0, 1, 2], tempo_us=[1, 2, 3],
          time_downsample_factor=8), 9),
    ("fsq_model", "EncoderCausal3D", "DecoderCausal3D",
     dict(double_z=False, z_channels=6), 5),
    ("causal_v1_444", "EncoderCausal3D", "DecoderCausal3D",
     dict(ch_mult=[1, 2, 2], spatial_ds=[1], spatial_us=[1], tempo_ds=[1],
          tempo_us=[1], time_downsample_factor=2), 5),
]


@pytest.mark.parametrize("name,enc,dec,over,T", ENCDEC_CASES,
                         ids=[c[0] for c in ENCDEC_CASES])
def test_encoder_decoder_parity(name, enc, dec, over, T):
    sd, arrays = load_golden(name)
    cfg = small_cfg(**over)
    reg = None
    if name == "fsq_model":
        reg = {"target": "FSQRegularizer",
               "params": {"levels": [8, 8, 8, 5, 5, 5]}}
    core, meta = make_core(enc, dec, cfg, reg=reg)
    params = check_convert(core, cfg, sd, T)

    x = to_nthwc(arrays["x"])
    zp = core.apply({"params": params}, x, method=TokenizerCore.encode_raw)
    np.testing.assert_allclose(to_ncthw(zp), arrays["zp"], **TOL)

    z = to_nthwc(arrays["z"])
    dec_out = core.apply({"params": params}, z, method=TokenizerCore.decode)
    np.testing.assert_allclose(to_ncthw(dec_out), arrays["dec"], **TOL)

    if "kl_loss" in arrays:
        from vidtok_tpu.modules.regularizers import DiagonalGaussian

        kl = DiagonalGaussian(zp).kl()
        kl_loss = float(jnp.sum(kl) / kl.shape[0])
        assert abs(kl_loss - float(arrays["kl_loss"])) / max(
            1.0, abs(float(arrays["kl_loss"]))) < 1e-3


def test_fsq_regularizer_parity():
    sd, arrays = load_golden("fsq_regularizer")
    from vidtok_tpu.modules.regularizers import FSQRegularizer

    reg = FSQRegularizer(levels=(8, 8, 8, 5, 5, 5), entropy_loss_weight=0.1,
                         commitment_loss_weight=0.25, diversity_gamma=1.0)
    z = to_nthwc(arrays["z"])  # [B,T,H,W,D]
    out, log = reg.apply({"params": {}}, z, n_steps=0)
    np.testing.assert_allclose(to_ncthw(out), arrays["out"], **TOL)
    np.testing.assert_array_equal(np.asarray(log["indices"]),
                                  arrays["indices"].astype(np.int32))
    assert abs(float(log["aux_loss"]) - float(arrays["aux_loss"])) < 1e-4


def test_fsq_annealing_parity():
    _, arrays = load_golden("fsq_annealing")
    from vidtok_tpu.modules.regularizers import FSQRegularizer

    reg = FSQRegularizer(levels=(8, 8, 8, 5, 5, 5), entropy_loss_weight=0.1,
                         entropy_loss_annealing_steps=100,
                         entropy_loss_annealing_factor=3.0,
                         commitment_loss_weight=0.25)
    z = to_nthwc(arrays["z"])
    out, log = reg.apply({"params": {}}, z, n_steps=40)
    assert abs(float(log["aux_loss"]) - float(arrays["aux_loss"])) < 1e-4


def test_v1_1_tiled_streaming_parity():
    """Chunked streaming encode/decode (lax-scannable cache path) matches the
    reference's tiled inference exactly — including overlap cache offsets."""
    sd, arrays = load_golden("causal_v1_1_tiled")
    from vidtok_tpu.models.autoencoder import VideoTokenizer

    cfg = small_cfg(interpolation_mode="trilinear")
    core, meta = make_core("EncoderCausal3DV1_1", "DecoderCausal3DV1_1", cfg)
    params = check_convert(core, cfg, sd, 5)
    meta = dict(meta, use_tiling=True, t_chunk_enc=int(arrays["t_chunk_enc"]))
    tok = VideoTokenizer(core, params, meta)
    tok.use_overlap = True

    x = jnp.asarray(arrays["x"])

    # single shot
    tok_ss = VideoTokenizer(core, params, dict(meta, use_tiling=False))
    z_full = tok_ss.encode(x)
    np.testing.assert_allclose(np.asarray(z_full), arrays["z_full"], **TOL)
    dec_full = tok_ss.decode(z_full)
    np.testing.assert_allclose(np.asarray(dec_full), arrays["dec_full"], **TOL)

    # tiled
    z_tiled = tok.encode(x)
    np.testing.assert_allclose(np.asarray(z_tiled), arrays["z_tiled"], **TOL)
    dec_tiled = tok.decode(z_tiled)
    np.testing.assert_allclose(np.asarray(dec_tiled), arrays["dec_tiled"],
                               **TOL)


def test_v1_1_scan_streaming_parity():
    """The single-graph lax.scan streaming path (BASELINE north star) matches
    the reference tiled outputs bit-for-bit."""
    sd, arrays = load_golden("causal_v1_1_tiled")
    from vidtok_tpu.models.autoencoder import VideoTokenizer

    cfg = small_cfg(interpolation_mode="trilinear")
    core, meta = make_core("EncoderCausal3DV1_1", "DecoderCausal3DV1_1", cfg)
    params = check_convert(core, cfg, sd, 5)
    meta = dict(meta, use_tiling=True, t_chunk_enc=int(arrays["t_chunk_enc"]))
    tok = VideoTokenizer(core, params, meta)
    tok.use_overlap = True

    z, log = tok.encode_streaming_scan(jnp.asarray(arrays["x"]), sample=False)
    np.testing.assert_allclose(np.asarray(z), arrays["z_tiled"], **TOL)
    dec = tok.decode_streaming_scan(z)
    np.testing.assert_allclose(np.asarray(dec), arrays["dec_tiled"], **TOL)


def test_metrics_parity():
    _, arrays = load_golden("metrics")
    from vidtok_tpu.ops.metrics import compute_psnr, compute_ssim

    assert abs(float(compute_psnr(arrays["x"], arrays["y"])) - float(arrays["psnr"])) < 1e-3
    assert abs(float(compute_ssim(arrays["x"], arrays["y"])) - float(arrays["ssim"])) < 1e-4
    assert abs(float(compute_psnr(arrays["x2"], arrays["y2"])) - float(arrays["psnr2"])) < 1e-3
    assert abs(float(compute_ssim(arrays["x2"], arrays["y2"])) - float(arrays["ssim2"])) < 1e-4


def test_metrics_ssim_variants_parity():
    """Per-channel and complex SSIM variants vs the torch reference
    (util.py:181-302; goldens regenerated on miss)."""
    _, arrays = load_golden("metrics")
    if "ss_pc" not in arrays:
        import pytest
        pytest.skip("metrics golden predates SSIM-variant fields; "
                    "regen via tools/gen_goldens.py")
    from vidtok_tpu.ops.metrics import (ssim_per_channel,
                                        ssim_per_channel_complex)

    xf, yf = arrays["x"][:, :, 0], arrays["y"][:, :, 0]
    ss, cs = ssim_per_channel(xf, yf)
    np.testing.assert_allclose(np.asarray(ss), arrays["ss_pc"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs), arrays["cs_pc"], atol=1e-5)

    ss_c, cs_c = ssim_per_channel_complex(arrays["xc"], arrays["yc"])
    np.testing.assert_allclose(np.asarray(ss_c), arrays["ss_cx"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(cs_c), arrays["cs_cx"], atol=1e-5)


def test_fsq_projections_roundtrip():
    """FSQ with dim != len(levels): project_in/out Linears
    (reference regularizers.py:137-139); indices->latent must equal the
    quantized forward output."""
    from vidtok_tpu.modules.regularizers import FSQRegularizer

    reg = FSQRegularizer(levels=(8, 8), dim=6)
    z = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 3, 4, 4, 6).astype("float32"))
    variables = reg.init(jax.random.PRNGKey(0), z)
    assert "project_in" in variables["params"]
    out, log = reg.apply(variables, z)
    assert out.shape == z.shape
    z2 = reg.apply(variables, log["indices"],
                   method=FSQRegularizer.decode_indices)
    np.testing.assert_allclose(np.asarray(out), np.asarray(z2), atol=1e-5)


def test_flagship_full_width_parity():
    """Shipped-scale parity: ch=128, ch_mult [1,2,4,4], z=16 (the
    kl_causal_488_16chn architecture) at 17x64x64. The 122M-param torch
    state_dict is regenerated from the fixture's seeded numpy stream
    (tools/gen_goldens.py gen_flagship) instead of being stored."""
    _, arrays = load_golden("flagship_kl16")
    sd = {}
    for prefix, names_key, shapes_prefix, seed in (
            ("encoder", "enc_names", "eshape", 311),
            ("decoder", "dec_names", "dshape", 312)):
        rs = np.random.RandomState(seed)
        for name in arrays[names_key]:
            name = str(name)
            shape = tuple(int(v) for v in arrays[f"{shapes_prefix}:{name}"])
            sd[f"{prefix}.{name}"] = (rs.randn(*shape) * 0.05).astype(
                np.float32)

    cfg = small_cfg(ch=128, ch_mult=[1, 2, 4, 4], z_channels=16,
                    tempo_ds=[0, 1], tempo_us=[1, 2],
                    time_downsample_factor=4, norm_type="layernorm")
    core, meta = make_core("EncoderCausal3D", "DecoderCausal3D", cfg)
    params = check_convert(core, cfg, sd, 5, H=32, W=32)

    x = to_nthwc(arrays["x"])
    zp = core.apply({"params": params}, x, method=TokenizerCore.encode_raw)
    np.testing.assert_allclose(to_ncthw(zp), arrays["zp"], **TOL)

    z = to_nthwc(arrays["z"])
    dec_out = core.apply({"params": params}, z, method=TokenizerCore.decode)
    np.testing.assert_allclose(to_ncthw(dec_out), arrays["dec"], **TOL)


def test_v1_1_long129_tiled_parity_both_overlap_modes():
    """BASELINE config-#4 protocol: 129 frames, chunk_size 16, tdf=4 — tiled
    encode + tiled decode with AND without overlap must match the torch
    reference's tile_encode/tile_decode (autoencoder_v1_1.py:218-331)."""
    sd, arrays = load_golden("causal_v1_1_long129")
    from vidtok_tpu.models.autoencoder import VideoTokenizer

    cfg = small_cfg(interpolation_mode="trilinear")
    core, meta = make_core("EncoderCausal3DV1_1", "DecoderCausal3DV1_1", cfg)
    params = check_convert(core, cfg, sd, 5)
    meta = dict(meta, use_tiling=True, t_chunk_enc=int(arrays["t_chunk_enc"]))
    tok = VideoTokenizer(core, params, meta)
    x = jnp.asarray(arrays["x"])
    assert x.shape[2] == 129 and int(arrays["t_chunk_enc"]) == 16

    z_tiled = tok.encode(x)
    np.testing.assert_allclose(np.asarray(z_tiled), arrays["z_tiled"], **TOL)

    tok.use_overlap = False
    dec_plain = tok.decode(z_tiled)
    np.testing.assert_allclose(np.asarray(dec_plain), arrays["dec_plain"],
                               **TOL)

    tok.use_overlap = True
    dec_overlap = tok.decode(z_tiled)
    np.testing.assert_allclose(np.asarray(dec_overlap),
                               arrays["dec_overlap"], **TOL)
