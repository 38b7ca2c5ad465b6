"""VidTwin parity vs the torch reference (golden fixtures) + causal
attention semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.golden_utils import load_golden
from vidtok_tpu.models.vidtwin import (QFormerInterface, STTDecoder,
                                       STTEncoder, VidTwinVAE,
                                       build_vidtwin_from_config)
from vidtok_tpu.models.vidtwin.convert import convert_vidtwin_state_dict

TOL = dict(atol=3e-4, rtol=3e-3)


def small_cfg(temporal_casual=False):
    return {"params": {
        "expect_ch": 8, "cont_num_blocks": 1, "downsample_motion": True,
        "motion_num_blocks": 1, "d_dim": 8, "init_ch": 16,
        "temporal_qformer_config": {"target": "q", "params": {
            "num_query_tokens": 4, "query_hidden_size": 32,
            "encoder_hidden_size": 64}},
        "encoder_config": {"target": "e", "params": {
            "in_channels": 3, "input_size": [4, 32, 32],
            "patch_size": [1, 8, 8], "hidden_size": 64, "depth": 2,
            "num_heads": 4, "temporal_casual": temporal_casual}},
        "decoder_config": {"target": "d", "params": {
            "in_channels": 3, "input_size": [4, 32, 32],
            "patch_size": [1, 8, 8], "hidden_size": 64, "depth": 2,
            "num_heads": 4, "temporal_casual": temporal_casual}},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer",
                               "params": {"sample": False}},
    }}


def _build_fp32(temporal_casual=False):
    model, _ = build_vidtwin_from_config(small_cfg(temporal_casual))
    # strict-parity: fp32 attention (the reference oracle was cast-neutralized)
    enc = model.encoder.clone(attn_dtype=None)
    dec = model.decoder.clone(attn_dtype=None)
    return model.clone(encoder=enc, decoder=dec, sample=False)


def to_nthwc(x):
    return jnp.transpose(jnp.asarray(x), (0, 2, 3, 4, 1))


def to_ncthw(x):
    return np.transpose(np.asarray(x), (0, 4, 1, 2, 3))


@pytest.fixture(scope="module")
def vidtwin_golden():
    sd, arrays = load_golden("vidtwin")
    model = _build_fp32()
    params = convert_vidtwin_state_dict(sd)
    # validate against an init tree
    x = jnp.zeros((1, 4, 32, 32, 3))
    ref = model.init({"params": jax.random.PRNGKey(0),
                      "sample": jax.random.PRNGKey(0)}, x)["params"]
    from vidtok_tpu.utils.checkpoint import validate_params

    missing, unexpected, mismatched = validate_params(params, ref)
    assert not missing, missing[:8]
    assert not unexpected, unexpected[:8]
    assert not mismatched, mismatched[:8]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return model, params, arrays


def test_stt_encoder_parity(vidtwin_golden):
    model, params, arrays = vidtwin_golden
    x = to_nthwc(arrays["x"])
    z = model.encoder.apply({"params": params["encoder"]}, x)
    np.testing.assert_allclose(to_ncthw(z), arrays["z_enc"], **TOL)


def test_stt_decoder_parity(vidtwin_golden):
    model, params, arrays = vidtwin_golden
    z = to_nthwc(arrays["z_enc"])
    dec = model.decoder.apply({"params": params["decoder"]}, z)
    np.testing.assert_allclose(to_ncthw(dec), arrays["dec_direct"], **TOL)


def test_qformer_parity(vidtwin_golden):
    model, params, arrays = vidtwin_golden
    q = model.qformer.apply({"params": params["qformer"]},
                            jnp.asarray(arrays["qin"]))
    np.testing.assert_allclose(np.asarray(q), arrays["q_out"], **TOL)


def test_vidtwin_encode_decode_parity(vidtwin_golden):
    model, params, arrays = vidtwin_golden
    x = to_nthwc(arrays["x"])
    rngs = {"sample": jax.random.PRNGKey(0)}
    z, u_s, u_dx, u_dy, reg_log = model.apply(
        {"params": params}, x, sample_override=False,
        method=VidTwinVAE.encode, rngs=rngs)
    np.testing.assert_allclose(np.asarray(u_s), arrays["z_content"], **TOL)
    np.testing.assert_allclose(np.asarray(u_dx), arrays["z_mx"], **TOL)
    np.testing.assert_allclose(np.asarray(u_dy), arrays["z_my"], **TOL)
    rel = abs(float(reg_log["kl_loss"]) - float(arrays["kl_loss"])) / max(
        1.0, abs(float(arrays["kl_loss"])))
    assert rel < 1e-3

    dec = model.apply({"params": params}, u_s, u_dx, u_dy,
                      method=VidTwinVAE.decode, rngs=rngs)
    np.testing.assert_allclose(to_ncthw(dec), arrays["dec"], **TOL)

    dec_c = model.apply({"params": params}, u_s, u_dx, u_dy,
                        only_part="content", method=VidTwinVAE.decode,
                        rngs=rngs)
    np.testing.assert_allclose(to_ncthw(dec_c), arrays["dec_content"], **TOL)


def test_temporal_causality():
    """With temporal_causal=True, latent frame t must not depend on input
    frames > t (the reference's non-flash torch path silently drops the
    causal flag — st_transformer.py:123-132 — so this is validated natively
    rather than against the oracle)."""
    model = _build_fp32(temporal_casual=True)
    rng = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(0)}
    x = jnp.asarray(np.random.RandomState(0).randn(1, 4, 32, 32, 3),
                    jnp.float32)
    variables = model.init(rng, x)
    enc = model.encoder

    z1 = enc.apply({"params": variables["params"]["encoder"]}, x)
    x2 = x.at[:, 2:].set(0.0)  # perturb frames 2..3
    z2 = enc.apply({"params": variables["params"]["encoder"]}, x2)
    np.testing.assert_allclose(np.asarray(z1[:, :2]), np.asarray(z2[:, :2]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(z1[:, 2:]), np.asarray(z2[:, 2:]))


def test_engine_forward_and_cross_reenact(tmp_path):
    """VidTwinTokenizer public engine: from_config init, NCTHW forward,
    and cross-reenactment (structure of A + dynamics of B — reference
    inference_vidtwin_cross_reconstruct.py:232-239) run end-to-end and
    keep shapes."""
    import yaml

    from vidtok_tpu.models.vidtwin.engine import VidTwinTokenizer

    cfg = {"model": {"target": "VidTwinVAE", **small_cfg()}}
    p = tmp_path / "tiny_vidtwin.yaml"
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)

    tok = VidTwinTokenizer.from_config(str(p))
    x = np.random.RandomState(0).randn(2, 3, 4, 32, 32).astype("float32") * 0.3
    z, dec, log = tok.forward(jnp.asarray(x))
    assert dec.shape == x.shape
    assert np.isfinite(np.asarray(dec)).all()

    u_s, u_dx, u_dy, _ = tok.encode(jnp.asarray(x))
    dec2 = tok.decode(u_s, u_dx, u_dy)
    assert dec2.shape == x.shape

    xr = tok.cross_reenact(jnp.asarray(x[:1]), jnp.asarray(x[1:]))
    assert xr.shape == (1,) + x.shape[1:]
    assert np.isfinite(np.asarray(xr)).all()
