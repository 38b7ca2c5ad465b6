"""Discriminator parity vs the torch reference (eval mode, running stats)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.golden_utils import load_golden
from vidtok_tpu.modules.discriminator import (NLayerDiscriminator,
                                              NLayerDiscriminator3D)
from vidtok_tpu.utils.checkpoint import convert_discriminator_state_dict

TOL = dict(atol=3e-4, rtol=3e-3)


def test_disc_2d_parity():
    sd, arrays = load_golden("discriminators")
    params, stats = convert_discriminator_state_dict(
        sd, prefix="loss.discriminator.")
    disc = NLayerDiscriminator(input_nc=3, n_layers=3)
    x = jnp.transpose(jnp.asarray(arrays["x2"]), (0, 2, 3, 1))
    y = disc.apply({"params": params, "batch_stats": stats}, x, train=False)
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, arrays["y2"], **TOL)


def test_actnorm_parity():
    """ActNorm: data-dependent init, eval forward, logdet, and reverse all
    match the torch reference (discriminator.py:16-85)."""
    from vidtok_tpu.modules.discriminator import ActNorm

    sd, arrays = load_golden("actnorm")
    an = ActNorm(logdet=True)
    x_init = jnp.transpose(jnp.asarray(arrays["x_init"]), (0, 2, 3, 1))
    x_eval = jnp.transpose(jnp.asarray(arrays["x_eval"]), (0, 2, 3, 1))

    # flax data-dependent init == torch first-training-batch init
    variables = an.init(jax.random.PRNGKey(0), x_init)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["loc"]),
        np.asarray(sd["an.loc"]).reshape(-1), **TOL)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["scale"]),
        np.asarray(sd["an.scale"]).reshape(-1), **TOL)

    y, logdet = an.apply(variables, x_eval)
    np.testing.assert_allclose(
        np.transpose(np.asarray(y), (0, 3, 1, 2)), arrays["y_eval"], **TOL)
    np.testing.assert_allclose(np.asarray(logdet), arrays["logdet"], **TOL)

    # reverse is the exact inverse
    x_rt = an.apply(variables, y, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rt), np.asarray(x_eval),
                               atol=1e-4, rtol=1e-4)


def test_disc_2d_actnorm_parity():
    sd, arrays = load_golden("actnorm")
    params, stats = convert_discriminator_state_dict(
        sd, prefix="loss.discriminator.")
    assert not stats  # ActNorm has no running statistics
    disc = NLayerDiscriminator(input_nc=3, n_layers=3, use_actnorm=True)
    x = jnp.transpose(jnp.asarray(arrays["xd"]), (0, 2, 3, 1))
    y = disc.apply({"params": params}, x, train=False)
    y = np.transpose(np.asarray(y), (0, 3, 1, 2))
    np.testing.assert_allclose(y, arrays["yd"], **TOL)


def test_disc_3d_parity():
    sd, arrays = load_golden("discriminators")
    params, stats = convert_discriminator_state_dict(
        sd, prefix="loss.discriminator3d.")
    disc = NLayerDiscriminator3D(input_nc=3, n_layers=3)
    x = jnp.transpose(jnp.asarray(arrays["x3"]), (0, 2, 3, 4, 1))
    y = disc.apply({"params": params, "batch_stats": stats}, x, train=False)
    y = np.transpose(np.asarray(y), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(y, arrays["y3"], **TOL)
