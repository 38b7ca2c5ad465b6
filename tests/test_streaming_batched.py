"""Multi-stream (batched) streaming serving: S independent video streams
batched through one chunk step must equal S single-stream runs stacked.

This is the TPU-native answer to streaming-decode throughput (the
reference serves one video at a time, autoencoder_v1_1.py:218-331): the
chunk graphs take [S, ...] batches, so a server batches concurrent
streams to recover the MXU width that batch-mode inference gets from
B>1. Caches are per-stream rows of the batched cache pytree — batching
must not leak state across streams.
"""

import jax.numpy as jnp
import numpy as np

from vidtok_tpu import load_model_from_config

_P = {
    "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
    "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
    "num_res_blocks": 1, "norm_type": "layernorm",
    "tempo_ds": [0], "tempo_us": [1]}


def _tok(**meta):
    cfg = {"model": {"params": {
        "encoder_config": {"target": "EncoderCausal3DV1_1",
                           "params": dict(_P, interpolation_mode="trilinear")},
        "decoder_config": {"target": "DecoderCausal3DV1_1",
                           "params": dict(_P, interpolation_mode="trilinear")},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
    }}}
    tok = load_model_from_config(cfg, init_shape=(1, 5, 16, 16))
    tok.use_tiling = True
    tok.t_chunk_enc = 4
    for k, v in meta.items():
        setattr(tok, k, v)
    return tok


def test_batched_streams_match_single_streams():
    S, T, H, W = 3, 9, 16, 16
    x = np.random.RandomState(0).randn(S, 3, T, H, W).astype("float32") * 0.5

    tok = _tok(use_overlap=True)
    zb = np.asarray(tok.encode(jnp.asarray(x)))
    z1 = [np.asarray(tok.encode(jnp.asarray(x[i:i + 1]))) for i in range(S)]
    np.testing.assert_allclose(zb, np.concatenate(z1, axis=0),
                               atol=1e-5, rtol=1e-5)

    db = np.asarray(tok.decode(jnp.asarray(zb)))
    d1 = [np.asarray(tok.decode(jnp.asarray(z))) for z in z1]
    np.testing.assert_allclose(db, np.concatenate(d1, axis=0),
                               atol=1e-5, rtol=1e-5)
    # tiled decode is uncropped (the engine's forward crops to the input
    # length, mirroring reference autoencoder_v1_1.py:333-342)
    assert db.shape[0] == S and db.shape[2] >= T


def test_batched_streams_scan_graph():
    """The lax.scan whole-video graph is also batch-safe (one compiled
    program serving S streams)."""
    S, T, H, W = 2, 9, 16, 16
    x = np.random.RandomState(1).randn(S, 3, T, H, W).astype("float32") * 0.5
    tok = _tok(use_overlap=False)
    zb, _ = tok.encode_streaming_scan(jnp.asarray(x))
    z1 = [tok.encode_streaming_scan(jnp.asarray(x[i:i + 1]))[0]
          for i in range(S)]
    np.testing.assert_allclose(np.asarray(zb),
                               np.concatenate([np.asarray(z) for z in z1], 0),
                               atol=1e-5, rtol=1e-5)


def test_chunk_size_is_a_pure_serving_knob():
    """Bigger streaming chunks (t_chunk 8 vs 4) must produce identical
    tokens and reconstructions — the chunk size only changes the
    step-graph shape (and the overlap lookahead waste fraction), never
    the math. Backs the larger-chunk multistream serving variant in
    tools/bench_suite.py."""
    S, T, H, W = 2, 17, 16, 16
    x = np.random.RandomState(2).randn(S, 3, T, H, W).astype("float32") * 0.5

    outs = {}
    for tc in (4, 8):
        tok = _tok(use_overlap=True, t_chunk_enc=tc)
        z = tok.encode(jnp.asarray(x))
        d = tok.decode(z)
        outs[tc] = (np.asarray(z), np.asarray(d))
    np.testing.assert_allclose(outs[4][0], outs[8][0], atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(outs[4][1], outs[8][1], atol=1e-5, rtol=1e-5)


def test_fused_streaming_matches_unfused():
    """VIDTOK_FUSED_STREAMING=1 routes the chunk graphs through the
    Pallas kernels (interpret-exact on CPU); tokens and reconstructions
    must match the default XLA chunk graphs — the A/B behind the
    multistream fused-kernel serving decision."""
    S, T, H, W = 2, 9, 16, 16
    x = np.random.RandomState(3).randn(S, 3, T, H, W).astype("float32") * 0.5

    outs = {}
    for fused in (False, True):
        tok = _tok(use_overlap=True)
        tok.fused_streaming = fused
        z = tok.encode(jnp.asarray(x))
        d = tok.decode(z)
        outs[fused] = (np.asarray(z), np.asarray(d))
    np.testing.assert_allclose(outs[False][0], outs[True][0],
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(outs[False][1], outs[True][1],
                               atol=2e-5, rtol=1e-5)
