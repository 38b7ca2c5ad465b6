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


def test_disc_3d_parity():
    sd, arrays = load_golden("discriminators")
    params, stats = convert_discriminator_state_dict(
        sd, prefix="loss.discriminator3d.")
    disc = NLayerDiscriminator3D(input_nc=3, n_layers=3)
    x = jnp.transpose(jnp.asarray(arrays["x3"]), (0, 2, 3, 4, 1))
    y = disc.apply({"params": params, "batch_stats": stats}, x, train=False)
    y = np.transpose(np.asarray(y), (0, 4, 1, 2, 3))
    np.testing.assert_allclose(y, arrays["y3"], **TOL)
