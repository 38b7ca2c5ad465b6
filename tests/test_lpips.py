"""LPIPS numerical parity vs the torch reference (reference
vidtok/modules/lpips.py:61-172) and checkpoint-converter round-trips.

The golden fixture carries a torchvision-layout VGG16 features state dict
(random weights), the LPIPS lin-head state dict, an input pair and the
reference distance; the test pushes the state dicts through
tools/convert_lpips.convert() — the exact flow used for real weights — and
asserts the distances match.
"""

import os
import sys

import jax.numpy as jnp
import numpy as np

from tests.golden_utils import load_golden

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(ROOT, "tools"))


def test_lpips_parity_via_converter():
    from convert_lpips import convert

    from vidtok_tpu.modules.lpips import LPIPS
    from vidtok_tpu.utils.checkpoint import unflatten_params

    sd, arrays = load_golden("lpips")
    feats_sd = {k[len("features."):]: v for k, v in sd.items()
                if k.startswith("features.")}
    lin_sd = {k: v for k, v in sd.items() if k.startswith("lin")}
    params = unflatten_params(convert(feats_sd, lin_sd))

    x = jnp.transpose(jnp.asarray(arrays["x"]), (0, 2, 3, 1))
    y = jnp.transpose(jnp.asarray(arrays["y"]), (0, 2, 3, 1))
    dist = LPIPS().apply({"params": params}, x, y)
    np.testing.assert_allclose(np.asarray(dist), arrays["dist"],
                               atol=1e-5, rtol=1e-4)
    # distances must be nontrivial for the parity to mean anything
    assert float(np.abs(arrays["dist"]).max()) > 1e-4


def test_lightning_ckpt_disc_logvar_roundtrip(tmp_path):
    """torch.save'd Lightning-style .ckpt -> load_torch_state_dict ->
    convert_discriminator_state_dict reproduces the reference
    discriminator's output; loss.logvar survives the file round trip
    (reference fine-tune flow, main.py:861-880 checkpoint layout)."""
    import torch

    from vidtok_tpu.modules.discriminator import NLayerDiscriminator
    from vidtok_tpu.utils.checkpoint import (convert_discriminator_state_dict,
                                             load_torch_state_dict)

    sd, arrays = load_golden("discriminators")
    state = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()
             if k.startswith("loss.discriminator.")}
    state["loss.logvar"] = torch.tensor(0.37)
    path = str(tmp_path / "synthetic.ckpt")
    torch.save({"state_dict": state, "global_step": 123}, path)

    loaded = load_torch_state_dict(path)
    assert float(loaded["loss.logvar"]) == np.float32(0.37)
    params, stats = convert_discriminator_state_dict(
        loaded, prefix="loss.discriminator.")
    disc = NLayerDiscriminator(input_nc=3, n_layers=3)
    x = jnp.transpose(jnp.asarray(arrays["x2"]), (0, 2, 3, 1))
    out = disc.apply({"params": params, "batch_stats": stats}, x, train=False)
    np.testing.assert_allclose(np.transpose(np.asarray(out), (0, 3, 1, 2)),
                               arrays["y2"], atol=3e-4, rtol=3e-3)
