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


_FSQ_P = {
    "double_z": False, "z_channels": 3, "in_channels": 3, "out_ch": 3,
    "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
    "num_res_blocks": 1, "norm_type": "layernorm",
    "tempo_ds": [0], "tempo_us": [1]}
FSQ_CFG = {"params": {
    "encoder_config": {"target": "EncoderCausal3D", "params": dict(_FSQ_P)},
    "decoder_config": {"target": "DecoderCausal3D", "params": dict(_FSQ_P)},
    "regularizer_config": {"target": "FSQRegularizer", "params": {
        "levels": [5, 3, 3],
        "entropy_loss_weight": 0.1,
        "entropy_loss_annealing_steps": 10,
        "entropy_loss_annealing_factor": 3,
        "commitment_loss_weight": 0.25}},
}}


def test_height_sharded_flagship_topology():
    """H-sharded inference at the shipped TOPOLOGY (4 levels, ch_mult
    [1,2,4,4], tdf=4, z=16 — the kl_causal_488_16chn structure, width
    reduced for CPU): 4-way spatial sharding equals single-device, with XLA
    inserting conv halo exchanges at every level incl. the 8x-downsampled
    deepest one. Full-width numerical parity is covered by the
    flagship_kl16 golden (test_parity)."""
    _FP = {
        "double_z": True, "z_channels": 16, "in_channels": 3, "out_ch": 3,
        "ch": 32, "ch_mult": [1, 2, 4, 4], "time_downsample_factor": 4,
        "num_res_blocks": 2, "norm_type": "layernorm",
        "tempo_ds": [0, 1], "tempo_us": [1, 2]}
    cfg = {"params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": dict(_FP)},
        "decoder_config": {"target": "DecoderCausal3D", "params": dict(_FP)},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
    }}
    core, meta = build_core_from_config(cfg)
    x = jnp.asarray(np.random.RandomState(5)
                    .randn(1, 3, 5, 64, 64).astype("float32") * 0.5)
    variables = core.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 5, 64, 64, 3)), sample_override=False)
    tok = VideoTokenizer(core, variables["params"], meta)

    z1, dec1, _ = tok(x)
    mesh = make_mesh(n_data=2, n_spatial=4)
    z2, dec2, _ = tok.forward_sharded(x, mesh)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2), atol=2e-4)


def test_fsq_sharded_aux_loss_matches_single_device():
    """Batch-sharded FSQ aux_loss/indices == single-device (the DDP
    all-reduce of the codebook probability mean, reference
    regularizers.py:49-54, falls out of jnp.mean under pjit)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    core, meta = build_core_from_config(FSQ_CFG)
    assert meta["discrete"]
    x = jnp.asarray(np.random.RandomState(2)
                    .randn(8, 3, 5, 32, 32).astype("float32") * 0.5)
    variables = core.init({"params": jax.random.PRNGKey(0),
                           "sample": jax.random.PRNGKey(0)},
                          jnp.zeros((1, 5, 32, 32, 3)), sample_override=False)
    tok = VideoTokenizer(core, variables["params"], meta)

    fn = tok._full_forward_fn(sample=False)
    z1, dec1, log1 = jax.jit(fn)(tok.params, x, jax.random.PRNGKey(0))

    mesh = make_mesh(n_data=8)
    rep = NamedSharding(mesh, P())
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    params = jax.device_put(tok.params, rep)
    z2, dec2, log2 = jax.jit(fn)(params, xs, jax.random.PRNGKey(0))

    np.testing.assert_array_equal(np.asarray(log1["indices"]),
                                  np.asarray(log2["indices"]))
    np.testing.assert_allclose(float(log1["aux_loss"]),
                               float(log2["aux_loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dec1), np.asarray(dec2), atol=1e-5)


def test_fsq_3d_disc_train_step_on_mesh():
    """Full FSQ + 3D-discriminator GAN step batch-sharded over 8 devices
    runs and yields finite losses (sharded==single-device equality of the
    FSQ aux terms is pinned by the forward test above)."""
    from vidtok_tpu.train.trainer import VidTokTrainer

    cfg = {"model": {"base_learning_rate": 1e-4, "params": {
        **FSQ_CFG["params"],
        "loss_config": {"target": "GeneralLPIPSWithDiscriminator", "params": {
            "dims": 3, "perceptual_weight": 1.0, "disc_start": 0,
            "disc_weight": 0.2, "disc_type": "3d", "learn_logvar": True,
            "gen_loss_cross_entropy": True, "lecam_loss_weight": 0.005,
            "regularization_weights": {"aux_loss": 1.0, "kl_loss": 1e-6}}},
    }}}
    x = (np.random.RandomState(3)
         .randn(8, 5, 16, 16, 3).astype("float32") * 0.3)

    tr8 = VidTokTrainer(cfg, mesh=make_mesh(n_data=8))
    s8 = tr8.shard_state(tr8.init_state(x))
    s8, logs8 = tr8.fit_step(s8, x, jax.random.PRNGKey(0))
    assert int(jax.device_get(s8.step)) == 1
    for k in ("train/aeloss", "train/discloss", "train/aux_loss"):
        assert np.isfinite(float(logs8[k])), k


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
