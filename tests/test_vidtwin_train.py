"""VidTwin training step smoke test (full GAN + schedules)."""

import jax
import numpy as np

from vidtok_tpu.models.vidtwin.trainer import VidTwinTrainer

CFG = {
    "model": {"base_learning_rate": 1e-4, "params": {
        "expect_ch": 8, "cont_num_blocks": 1, "downsample_motion": True,
        "motion_num_blocks": 1, "d_dim": 8, "init_ch": 16,
        "temporal_qformer_config": {"target": "q", "params": {
            "num_query_tokens": 4, "query_hidden_size": 32,
            "encoder_hidden_size": 64}},
        "encoder_config": {"target": "e", "params": {
            "in_channels": 3, "input_size": [4, 32, 32],
            "patch_size": [1, 8, 8], "hidden_size": 64, "depth": 2,
            "num_heads": 4, "temporal_casual": True}},
        "decoder_config": {"target": "d", "params": {
            "in_channels": 3, "input_size": [4, 32, 32],
            "patch_size": [1, 8, 8], "hidden_size": 64, "depth": 2,
            "num_heads": 4, "temporal_casual": True}},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer",
                               "params": {"sample": True}},
        "loss_config": {"target": "GeneralLPIPSWithDiscriminator", "params": {
            "dims": 3, "perceptual_weight": 0.05, "disc_start": 0,
            "disc_weight": 0.05, "disc_type": "2d", "learn_logvar": True,
            "regularization_weights": {"kl_loss": 0.001}}},
        "lr_scheduler_config_g": {
            "target": "LambdaWarmUpCosineScheduler",
            "params": {"lr_min": 0, "lr_max": 3e-5, "lr_start": 0,
                       "warmup_steps": 100}},
        "lr_scheduler_config_d": {
            "target": "LambdaWarmUpCosineScheduler",
            "params": {"lr_min": 0, "lr_max": 1.5e-5, "lr_start": 1e-5,
                       "warmup_steps": 100}},
        "optimizer_config": {"target": "torch.optim.AdamW", "params": {
            "betas": [0, 0.9], "weight_decay": 1e-4}},
    }}}


def test_vidtwin_train_step():
    tr = VidTwinTrainer(CFG, total_steps=1000)
    x = np.random.RandomState(0).randn(8, 4, 32, 32, 3).astype("float32") * .3
    from vidtok_tpu.parallel.mesh import replicate

    state = replicate(tr.mesh, tr.init_state(x))
    p0 = np.asarray(jax.device_get(
        state.params_g["core"]["qformer"]["query_embeds"]))
    state, logs = tr.fit_step(state, x, jax.random.PRNGKey(0))
    assert int(state.step) == 1
    assert np.isfinite(float(logs["train/aeloss"]))
    assert np.isfinite(float(logs["train/discloss"]))
    # warmup schedules: step0 lr_g = lr_start = 0 -> params unchanged on g?
    # (AdamW with lr 0 -> no update except weight decay*0). lr_d starts 1e-5.
    assert float(logs["train/lr_g"]) == 0.0
    assert abs(float(logs["train/lr_d"]) - 1e-5) < 1e-9
    state, logs = tr.fit_step(state, x, jax.random.PRNGKey(1))
    p2 = np.asarray(jax.device_get(
        state.params_g["core"]["qformer"]["query_embeds"]))
    assert not np.allclose(p0, p2), "vidtwin generator did not update"
    assert float(logs["train/lr_g"]) > 0.0
