"""Activation checkpointing (use_checkpoint -> nn.remat) correctness.

The reference wraps blocks in torch.utils.checkpoint when use_checkpoint
is set (vidtok/modules/util.py:89-143); here the flag swaps residual
blocks for nn.remat-wrapped classes (modules/encoder.py:120-133,
modules/decoder.py:141-154). Remat must be value- and grad-exact vs the
plain path, and the streaming path must bypass it (caches are
incompatible with remat).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vidtok_tpu import load_model_from_config

_P = {
    "double_z": True, "z_channels": 4, "in_channels": 3, "out_ch": 3,
    "ch": 32, "ch_mult": [1, 2], "time_downsample_factor": 2,
    "num_res_blocks": 1, "norm_type": "layernorm",
    "tempo_ds": [0], "tempo_us": [1]}


def _cfg(**pov):
    p = dict(_P, **pov)
    return {"model": {"params": {
        "encoder_config": {"target": "EncoderCausal3D", "params": dict(p)},
        "decoder_config": {"target": "DecoderCausal3D", "params": dict(p)},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
    }}}


def _loss_fn(tok):
    # the training route (forward_train, deterministic=False) — the path
    # remat actually has to be grad-exact on
    core = tok.core

    def loss(params, x, rng):
        z, dec, _pre, _log = core.apply(
            {"params": params}, x, rngs={"sample": rng},
            method=type(core).forward_train)
        return jnp.sum(dec * dec) + 0.1 * jnp.sum(z * z)

    return loss


def test_remat_fwd_and_grad_exact():
    tok = load_model_from_config(_cfg(), init_shape=(1, 5, 32, 32))
    tok_r = load_model_from_config(_cfg(use_checkpoint=True),
                                   init_shape=(1, 5, 32, 32))
    # remat wrapping must not change the parameter tree
    chex_struct = jax.tree_util.tree_structure(tok.params)
    assert chex_struct == jax.tree_util.tree_structure(tok_r.params)
    tok_r.params = tok.params

    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 3, 5, 32, 32).astype("float32") * 0.5)
    rng = jax.random.PRNGKey(0)

    _, dec, _ = tok(x)
    _, dec_r, _ = tok_r(x)
    np.testing.assert_array_equal(np.asarray(dec), np.asarray(dec_r))

    xt = jnp.transpose(x, (0, 2, 3, 4, 1))  # NTHWC for forward_train
    g = jax.jit(jax.grad(_loss_fn(tok)))(tok.params, xt, rng)
    g_r = jax.jit(jax.grad(_loss_fn(tok_r)))(tok_r.params, xt, rng)
    flat, _ = jax.tree_util.tree_flatten(g)
    flat_r, _ = jax.tree_util.tree_flatten(g_r)
    assert any(float(jnp.max(jnp.abs(a))) > 0 for a in flat)
    # grads: tight allclose, not bit-equality — remat of the aux stages
    # (mid/attn/up/downsample, round 5) reorders XLA reduction schedules
    # by a few ulp (measured max rel diff 2.7e-6 on CPU); bit-exactness
    # is not part of jax.checkpoint's contract
    for a, b in zip(flat, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-4)


def test_remat_streaming_bypass():
    """Streaming chunks must produce identical results with the flag on
    (remat is bypassed on the streaming path, which threads cache state)."""
    tok = load_model_from_config(_cfg(), init_shape=(1, 5, 32, 32))
    tok_r = load_model_from_config(_cfg(use_checkpoint=True),
                                   init_shape=(1, 5, 32, 32))
    tok_r.params = tok.params

    x = jnp.asarray(np.random.RandomState(1)
                    .randn(1, 3, 17, 32, 32).astype("float32") * 0.5)
    z, _log = tok.encode_streaming_scan(x)
    z_r, _log_r = tok_r.encode_streaming_scan(x)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(z_r))
