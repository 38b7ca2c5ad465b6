"""Training-stack tests: full GAN step on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vidtok_tpu.train.trainer import VidTokTrainer

TINY_CFG = {
    "model": {"base_learning_rate": 1e-4, "params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": {
            "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
            "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
            "num_res_blocks": 1, "norm_type": "layernorm",
            "tempo_ds": [0], "tempo_us": [1]}},
        "decoder_config": {"target": "DecoderCausal3D",
                           "params": "${model.params.encoder_config.params}"},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
        "loss_config": {"target": "GeneralLPIPSWithDiscriminator", "params": {
            "dims": 3, "perceptual_weight": 1.0, "disc_start": 0,
            "disc_weight": 0.2, "disc_type": "2d", "learn_logvar": True,
            "gen_loss_cross_entropy": True, "lecam_loss_weight": 0.005,
            "regularization_weights": {"aux_loss": 1.0, "kl_loss": 1e-6}}},
        "ema_decay": 0.999,
    }}}


@pytest.fixture(scope="module")
def trainer_and_state():
    tr = VidTokTrainer(TINY_CFG)
    x = np.random.RandomState(0).randn(8, 5, 32, 32, 3).astype("float32") * .3
    state = tr.init_state(x)
    state = tr.shard_state(state)
    return tr, state, x


def test_train_step_updates(trainer_and_state):
    tr, state, x = trainer_and_state
    p0 = jax.device_get(state.params_g["core"]["encoder"]["conv_in"]["kernel"])
    lv0 = float(state.params_g["logvar"])
    state, logs = tr.fit_step(state, x, jax.random.PRNGKey(0))
    assert int(state.step) == 1
    for k in ("train/aeloss", "train/discloss", "train/d_weight",
              "train/p_loss", "train/kl_loss"):
        assert np.isfinite(float(logs[k])), k
    p1 = jax.device_get(state.params_g["core"]["encoder"]["conv_in"]["kernel"])
    assert not np.allclose(p0, p1), "generator params did not update"
    assert float(state.params_g["logvar"]) != lv0, "learned logvar frozen"
    # disc gated ON (disc_start=0) -> d_weight nonzero
    assert float(logs["train/d_weight"]) > 0

    # second step: EMA shadow should move toward params, lecam emas update
    ema0 = jax.device_get(state.ema_params[0]["core"]["encoder"]["conv_in"]["kernel"])
    state, logs = tr.fit_step(state, x, jax.random.PRNGKey(1))
    ema1 = jax.device_get(state.ema_params[0]["core"]["encoder"]["conv_in"]["kernel"])
    assert not np.allclose(ema0, ema1)
    assert float(state.lecam_ema_real) != 0.0


def test_disc_warmup_gating():
    cfg = {"model": {**TINY_CFG["model"],
                     "params": {**TINY_CFG["model"]["params"],
                                "loss_config": {
        "target": "GeneralLPIPSWithDiscriminator", "params": {
            **TINY_CFG["model"]["params"]["loss_config"]["params"],
            "disc_start": 1000000}}}}}
    tr = VidTokTrainer(cfg)
    x = np.random.RandomState(0).randn(8, 5, 32, 32, 3).astype("float32") * .3
    state = tr.shard_state(tr.init_state(x))
    state, logs = tr.fit_step(state, x, jax.random.PRNGKey(0))
    assert float(logs["train/disc_factor"]) == 0.0
    assert float(logs["train/discloss"]) == 0.0
