"""VideoTokenizer engine API surface tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtok_tpu import load_model_from_config

_P = {
    "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
    "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
    "num_res_blocks": 1, "norm_type": "layernorm",
    "tempo_ds": [0], "tempo_us": [1]}


def cfg(reg=None, **pov):
    p = dict(_P, **pov)
    return {"model": {"params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": dict(p)},
        "decoder_config": {"target": "DecoderCausal3D", "params": dict(p)},
        "regularizer_config": reg or {"target": "DiagonalGaussianRegularizer"},
    }}}


@pytest.fixture(scope="module")
def tok():
    return load_model_from_config(cfg(), init_shape=(1, 5, 32, 32))


def test_forward_api(tok):
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 3, 5, 32, 32).astype("float32"))
    z, dec, log = tok(x)
    assert z.shape == (1, 4, 3, 16, 16)
    assert dec.shape == x.shape
    assert "kl_loss" in log


def test_encode_sampling_stochastic(tok):
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 3, 5, 32, 32).astype("float32"))
    z1 = tok.encode(x, sample=True)
    z2 = tok.encode(x, sample=True)
    assert not np.allclose(np.asarray(z1), np.asarray(z2)), \
        "posterior sampling must differ across rngs"
    z3 = tok.encode(x, sample=False)
    z4 = tok.encode(x, sample=False)
    np.testing.assert_array_equal(np.asarray(z3), np.asarray(z4))


def test_bf16_compute_close_to_fp32(tok):
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 3, 5, 32, 32).astype("float32") * 0.5)
    tok16 = load_model_from_config(cfg(), init_shape=(1, 5, 32, 32),
                                   compute_dtype=jnp.bfloat16)
    tok16.params = tok.params
    _, d32, _ = tok(x)
    _, d16, _ = tok16(x)
    # bf16 forward should stay within a perceptually irrelevant delta
    assert float(jnp.abs(d32 - d16).max()) < 0.15
    assert float(jnp.abs(d32 - d16).mean()) < 0.01


def test_fsq_token_api():
    fsq_cfg = cfg(reg={"target": "FSQRegularizer",
                       "params": {"levels": [8, 8, 8, 5, 5, 5]}},
                  double_z=False, z_channels=6)
    tok = load_model_from_config(fsq_cfg, init_shape=(1, 5, 32, 32))
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 3, 5, 32, 32).astype("float32"))
    z, log = tok.encode(x, return_reg_log=True)
    idx = log["indices"]
    assert idx.dtype == jnp.int32
    assert int(jnp.max(idx)) < 8 * 8 * 8 * 5 * 5 * 5
    dec = tok.decode(idx, decode_from_indices=True)
    dec2 = tok.decode(z)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(dec2), atol=1e-5)
