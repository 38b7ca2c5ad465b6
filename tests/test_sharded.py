"""Multi-chip sharded inference on the 8-device CPU mesh: spatially-sharded
forward must equal the single-device result (XLA inserts conv halo
exchanges)."""

import jax
import jax.numpy as jnp
import numpy as np

from vidtok_tpu.models.autoencoder import VideoTokenizer, build_core_from_config
from vidtok_tpu.parallel.mesh import make_mesh

_P = {
    "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
    "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
    "num_res_blocks": 1, "norm_type": "layernorm",
    "tempo_ds": [0], "tempo_us": [1]}
CFG = {"params": {
    "encoder_config": {"target": "EncoderCausal3D", "params": dict(_P)},
    "decoder_config": {"target": "DecoderCausal3D", "params": dict(_P)},
    "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
}}


def test_height_sharded_forward_matches_single_device():
    core, meta = build_core_from_config(CFG)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(1, 3, 5, 64, 64).astype("float32") * 0.5)
    variables = core.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 5, 64, 64, 3)), sample_override=False)
    tok = VideoTokenizer(core, variables["params"], meta)

    z1, dec1, _ = tok(x)

    mesh = make_mesh(n_data=4, n_spatial=2)
    assert mesh.devices.size == 8
    z2, dec2, _ = tok.forward_sharded(x, mesh)

    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2), atol=1e-5)


def test_data_sharded_batch_forward():
    core, meta = build_core_from_config(CFG)
    x = jnp.asarray(np.random.RandomState(1)
                    .randn(8, 3, 5, 32, 32).astype("float32") * 0.5)
    variables = core.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 5, 32, 32, 3)), sample_override=False)
    tok = VideoTokenizer(core, variables["params"], meta)
    z1, dec1, _ = tok(x)

    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh(n_data=8)
    fn = tok._full_forward_fn(sample=False)
    rep = NamedSharding(mesh, P())
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    params = jax.device_put(tok.params, rep)
    z2, dec2, _ = jax.jit(fn)(params, xs, jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2), atol=1e-5)
