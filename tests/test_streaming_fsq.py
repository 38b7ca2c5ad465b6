"""Self-consistency of FSQ tiled streaming: chunked encode must produce the
same discrete tokens as single-shot encode (v1.1 causality guarantees it)."""

import jax
import jax.numpy as jnp
import numpy as np

from vidtok_tpu.models.autoencoder import VideoTokenizer, build_core_from_config

_P = {
    "double_z": False, "z_channels": 6, "in_channels": 3, "out_ch": 3,
    "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
    "num_res_blocks": 1, "norm_type": "layernorm",
    "interpolation_mode": "trilinear", "tempo_ds": [0], "tempo_us": [1]}
CFG = {"params": {
    "encoder_config": {"target": "EncoderCausal3DV1_1", "params": dict(_P)},
    "decoder_config": {"target": "DecoderCausal3DV1_1", "params": dict(_P)},
    "regularizer_config": {"target": "FSQRegularizer",
                           "params": {"levels": [8, 8, 8, 5, 5, 5]}},
}}


def test_fsq_tiled_tokens_match_single_shot():
    core, meta = build_core_from_config(CFG)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 3, 9, 32, 32).astype("float32") * 0.5)
    t, h, w = 9, 32, 32
    variables = core.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(0)},
                          jnp.zeros((1, t, h, w, 3)), sample_override=False)
    params = variables["params"]

    tok_ss = VideoTokenizer(core, params, dict(meta, use_tiling=False))
    z_ss, log_ss = tok_ss.encode(x, return_reg_log=True)

    tok_t = VideoTokenizer(core, params, dict(meta, use_tiling=True,
                                              t_chunk_enc=4))
    tok_t.use_overlap = True
    z_t, log_t = tok_t.encode(x, return_reg_log=True)

    np.testing.assert_array_equal(np.asarray(log_ss["indices"]),
                                  np.asarray(log_t["indices"]))
    np.testing.assert_allclose(np.asarray(z_ss), np.asarray(z_t), atol=1e-5)

    # decode_from_indices through the tiled path reconstructs the same video
    dec_t = tok_t.decode(log_t["indices"], decode_from_indices=True)
    dec_ss = tok_ss.decode(log_ss["indices"], decode_from_indices=True)
    t_len = min(dec_t.shape[2], dec_ss.shape[2])
    np.testing.assert_allclose(np.asarray(dec_t)[:, :, -t_len:],
                               np.asarray(dec_ss)[:, :, -t_len:], atol=1e-4)
