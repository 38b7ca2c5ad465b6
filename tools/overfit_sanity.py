"""Overfit-one-batch sanity: the full GAN training stack should drive
reconstruction loss down fast on a single repeated batch. Run on CPU:

  python tools/overfit_sanity.py [steps]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vidtok_tpu.train.trainer import VidTokTrainer  # noqa: E402

CFG = {
    "model": {"base_learning_rate": 3e-4, "params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": {
            "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
            "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
            "num_res_blocks": 1, "norm_type": "layernorm",
            "tempo_ds": [0], "tempo_us": [1]}},
        "decoder_config": {"target": "DecoderCausal3D",
                           "params": "${model.params.encoder_config.params}"},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
        "loss_config": {"target": "GeneralLPIPSWithDiscriminator", "params": {
            "dims": 3, "perceptual_weight": 0.0, "disc_start": 1000000,
            "disc_weight": 0.2, "disc_type": "2d", "learn_logvar": False,
            "regularization_weights": {"kl_loss": 1e-6}}},
    }}}


def main(steps=60):
    tr = VidTokTrainer(CFG)
    rng = np.random.RandomState(0)
    base = rng.rand(1, 1, 32, 32, 3)
    x = np.clip(base + 0.1 * rng.randn(2, 5, 32, 32, 3), 0, 1) * 2 - 1
    x = x.astype(np.float32)
    state = tr.shard_state(tr.init_state(x))
    key = jax.random.PRNGKey(0)
    first = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, logs = tr.fit_step(state, x, sub)
        rec = float(logs["train/rec_loss"])
        if first is None:
            first = rec
        if i % 10 == 0 or i == steps - 1:
            print(f"step {i:3d}: rec_loss={rec:.4f} "
                  f"kl={float(logs['train/kl_loss']):.1f}")
    print(f"\nrec_loss {first:.4f} -> {rec:.4f} "
          f"({'OK' if rec < first * 0.5 else 'NOT LEARNING'})")
    return rec < first * 0.5


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    ok = main(steps)
    sys.exit(0 if ok else 1)
