"""One-command released-checkpoint converter.

    python tools/convert_ckpt.py <in.ckpt|in.safetensors> <out.npz> \
        [--config configs/<name>.yaml] [--core-only]

Covers every trainable section of a VidTok Lightning checkpoint
(reference released checkpoints, README.md:107-131): core
encoder/decoder/regularizer params, loss.logvar, the discriminator
(params + BN running stats), and the LitEma shadow params — unified over
utils/checkpoint.py's per-section converters.

The output .npz drops straight into a config's ``ckpt_path:`` (serving
loads the core section; see load_params) and ``load_full_npz`` exposes
the training sections for fine-tune resume. ``--config`` additionally
builds the model from that config and validates the converted tree
against its init shapes (missing/unexpected/mismatched report).
"""

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help=".ckpt or .safetensors checkpoint")
    ap.add_argument("out", help="output .npz path")
    ap.add_argument("--config", default=None,
                    help="model yaml to validate the converted tree against")
    ap.add_argument("--core-only", action="store_true",
                    help="write only the core params (plain npz, no sections)")
    args = ap.parse_args()

    from vidtok_tpu.utils.checkpoint import (
        convert_full_checkpoint, load_torch_state_dict, save_full_npz,
        validate_params, flatten_params)
    import numpy as np

    sd = load_torch_state_dict(args.src)
    sections = convert_full_checkpoint(sd)
    present = ", ".join(sorted(sections))
    print(f"[convert_ckpt] sections: {present}")

    if args.config:
        import jax
        import jax.numpy as jnp

        from vidtok_tpu.config import load_config
        from vidtok_tpu.models.autoencoder import build_core_from_config

        core, meta = build_core_from_config(load_config(args.config)["model"])
        x = jnp.zeros((1, 5, 32, 32, core.encoder.in_channels))
        ref = core.init({"params": jax.random.PRNGKey(0),
                         "sample": jax.random.PRNGKey(0)}, x,
                        sample_override=False)["params"]
        missing, unexpected, mismatched = validate_params(
            sections["core"], ref)
        print(f"[convert_ckpt] vs {os.path.basename(args.config)}: "
              f"{len(missing)} missing, {len(unexpected)} unexpected, "
              f"{len(mismatched)} mismatched")
        for name, items in (("missing", missing), ("unexpected", unexpected),
                            ("mismatched", mismatched)):
            for it in items[:8]:
                print(f"  {name}: {it}")
        if missing or mismatched:
            sys.exit(1)

    if args.core_only:
        np.savez(args.out, **flatten_params(sections["core"]))
    else:
        save_full_npz(args.out, sections)
    print(f"[convert_ckpt] wrote {args.out}")


if __name__ == "__main__":
    main()
