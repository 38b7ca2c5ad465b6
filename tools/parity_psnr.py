"""The literal BASELINE serving-parity demonstration.

BASELINE.json claims "<= 0.05 dB PSNR delta vs the PyTorch reference" for
the serving path. This tool measures exactly that at the flagship scale
and the reference eval protocol shape (kl_causal_488_16chn architecture,
1x3x17x256x256, reference scripts/inference_evaluate.py:183-186 16-frame
-split PSNR):

  stage torch  — builds the reference EncoderCausal3DPadding /
      DecoderCausal3DPadding with seeded-numpy weights (no reference code
      shipped; the model is imported from /root/reference as a numerical
      oracle, exactly like tools/gen_goldens.py) and records the fp32
      torch reconstruction of a smooth synthetic clip.
  stage jax    — regenerates the identical weights, converts them with
      the production converter, and runs (a) the f32 XLA path and (b) the
      actual bf16 + fused-Pallas-kernel serving path (the bench.py
      graph), reporting
        psnr_ref      PSNR(x, torch recon)          — reference quality
        psnr_f32      PSNR(x, jax f32 recon)        — parity-path quality
        psnr_serving  PSNR(x, jax bf16+fused recon) — serving quality
        delta_f32 / delta_serving   vs psnr_ref     — THE claim
        agree_f32 / agree_serving   PSNR(torch recon, jax recon)

Run stage jax on the TPU (default platform) to certify the real serving
output; on CPU the Pallas kernels run in interpret mode (exact-math
check only).

  python tools/parity_psnr.py torch [out.npz]
  python tools/parity_psnr.py jax   [out.npz]
"""

import importlib.util
import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

DEFAULT_NPZ = "/tmp/parity_psnr_torch.npz"
SEED_ENC, SEED_DEC = 311, 312  # match tools/gen_goldens.py gen_flagship
T, H, W = 17, 256, 256

# configs/vidtok_kl_causal_488_16chn.yaml params, with the reference's
# defaults made explicit (tempo_ds = [n-2, n-3] = [2, 1],
# model_3dcausal.py:540; tempo_us = [1, 2], :758)
FLAGSHIP = dict(
    double_z=True, z_channels=16, in_channels=3, out_ch=3, ch=128,
    ch_mult=[1, 2, 4, 4], time_downsample_factor=4, num_res_blocks=2,
    dropout=0.0, norm_type="layernorm", tempo_ds=[2, 1], tempo_us=[1, 2],
    init_pad_mode="replicate")


def smooth_clip(seed=99):
    """A smooth synthetic clip in [-1, 1]: low-frequency base + drift +
    mild noise — closer to video statistics than white noise."""
    rs = np.random.RandomState(seed)
    base = rs.randn(1, 3, 1, H // 8, W // 8)
    base = np.repeat(np.repeat(base, 8, axis=3), 8, axis=4)
    drift = np.cumsum(0.05 * rs.randn(1, 3, T, 1, 1), axis=2)
    x = np.tanh(base + drift + 0.1 * rs.randn(1, 3, T, H, W))
    return x.astype(np.float32)


def regen_sd(names_shapes):
    sd = {}
    for prefix, seed in (("encoder", SEED_ENC), ("decoder", SEED_DEC)):
        rs = np.random.RandomState(seed)
        for name, shape in names_shapes[prefix]:
            sd[f"{prefix}.{name}"] = (rs.randn(*shape) * 0.05).astype(
                np.float32)
    return sd


def split_psnr(a, b):
    """Reference eval protocol: clamp to [-1,1], map to [0,1], mean PSNR
    over 16-frame splits (inference_evaluate.py:183-186)."""
    from vidtok_tpu.ops.metrics import compute_psnr

    a = (np.clip(a, -1, 1) + 1) / 2
    b = (np.clip(b, -1, 1) + 1) / 2
    vals = []
    for s in range(0, a.shape[2], 16):
        va, vb = a[:, :, s:s + 16], b[:, :, s:s + 16]
        vals.append(float(compute_psnr(va, vb)))
    return float(np.mean(vals))


def stage_torch(out):
    spec = importlib.util.spec_from_file_location(
        "gg", os.path.join(ROOT, "tools", "gen_goldens.py"))
    gg = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gg)  # installs stubs, imports the reference
    torch = gg.torch

    enc = gg.m1.EncoderCausal3DPadding(**FLAGSHIP).eval()
    dec = gg.m1.DecoderCausal3DPadding(**FLAGSHIP).eval()
    gg.reinit_np(enc, SEED_ENC)
    gg.reinit_np(dec, SEED_DEC)

    x = torch.from_numpy(smooth_clip())
    with torch.no_grad():
        gg.set_attr_all(enc, "causal_cache", None)
        gg.set_attr_all(enc, "is_first_chunk", True)
        from vidtok.modules.distributions import DiagonalGaussianDistribution
        z = DiagonalGaussianDistribution(enc(x)).mode()
        gg.set_attr_all(dec, "causal_cache", None)
        gg.set_attr_all(dec, "is_first_chunk", True)
        gg.set_cache_offset([dec], 0)
        recon = dec(z)

    arrays = {"x": x.numpy(), "recon": recon.numpy().astype(np.float32)}
    for prefix, model in (("enc", enc), ("dec", dec)):
        names = []
        for name, p in model.named_parameters():
            arrays[f"{prefix}shape:{name}"] = np.array(p.shape)
            names.append(name)
        arrays[f"{prefix}_names"] = np.array(names)
    np.savez_compressed(out, **arrays)
    print(f"[parity_psnr] torch recon saved to {out} "
          f"(psnr_ref={split_psnr(arrays['x'], arrays['recon']):.3f} dB)")


def stage_jax(src, which="both"):
    import jax
    import jax.numpy as jnp

    from vidtok_tpu.models.autoencoder import (VideoTokenizer,
                                               build_core_from_config)
    from vidtok_tpu.utils.checkpoint import convert_torch_state_dict

    data = np.load(src)
    names_shapes = {
        "encoder": [(str(n), tuple(int(v) for v in data[f"encshape:{n}"]))
                    for n in data["enc_names"]],
        "decoder": [(str(n), tuple(int(v) for v in data[f"decshape:{n}"]))
                    for n in data["dec_names"]],
    }
    sd = regen_sd(names_shapes)
    params = convert_torch_state_dict(sd)

    model_cfg = {"params": {
        "encoder_config": {"target": "EncoderCausal3D",
                           "params": dict(FLAGSHIP)},
        "decoder_config": {"target": "DecoderCausal3D",
                           "params": dict(FLAGSHIP)},
        "regularizer_config": {"target": "DiagonalGaussianRegularizer"},
    }}
    core, meta = build_core_from_config(model_cfg)

    x = data["x"]
    ref = data["recon"]
    results = {"psnr_ref": split_psnr(x, ref)}

    outs = []
    if which in ("both", "f32"):
        # (a) f32 parity path (no fused kernels). jax.jit like bench.py —
        # op-by-op dispatch compiles each pallas_call standalone through a
        # stricter AOT path that rejects graphs the jitted serving graph
        # compiles fine. (Run this substage on CPU when the relay's f32
        # compile stalls: numerics are platform-independent here.)
        tok32 = VideoTokenizer(core, params, meta)
        fn32 = jax.jit(tok32._full_forward_fn(sample=False, fused=False))
        _, dec32, _ = fn32(tok32.params, jnp.asarray(x),
                           jax.random.PRNGKey(0))
        outs.append(("f32", np.asarray(dec32, dtype=np.float32)))

    if which in ("both", "serving"):
        # (b) the serving path: bf16 params/compute + fused Pallas
        # kernels — exactly the bench.py graph
        tok16 = VideoTokenizer(core, params, meta,
                               compute_dtype=jnp.bfloat16)
        p16 = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32
            else p, tok16.params)
        fn16 = jax.jit(tok16._full_forward_fn(sample=False, fused=True))
        _, dec16, _ = fn16(p16, jnp.asarray(x), jax.random.PRNGKey(0))
        outs.append(("serving", np.asarray(dec16.astype(jnp.float32))))

    for tag, out in outs:
        results[f"psnr_{tag}"] = split_psnr(x, out)
        results[f"delta_{tag}"] = results[f"psnr_{tag}"] - results["psnr_ref"]
        results[f"agree_{tag}"] = split_psnr(ref, out)
    results["platform"] = jax.devices()[0].platform
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in results.items()}))
    return results


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "jax"
    which = sys.argv[2] if len(sys.argv) > 2 else "both"
    path = sys.argv[3] if len(sys.argv) > 3 else DEFAULT_NPZ
    if stage == "torch":
        stage_torch(path)
    elif stage == "jax":
        stage_jax(path, which)
    else:
        raise SystemExit(f"unknown stage {stage}")


if __name__ == "__main__":
    main()
