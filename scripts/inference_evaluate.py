"""Evaluate reconstruction quality (PSNR/SSIM/LPIPS) over a directory of
videos — the de-facto regression harness (mirrors reference
scripts/inference_evaluate.py).

  python scripts/inference_evaluate.py --config configs/... --ckpt model.npz \
      --data_dir /path/to/videos [--input_height 256 --input_width 256]
      [--sample_fps 30 --num_frames 17] [--read_long_video --chunk_size 16]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--meta_path", type=str, default=None)
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=256)
    p.add_argument("--sample_fps", type=int, default=30)
    p.add_argument("--num_frames", type=int, default=None,
                   help="default: 17 causal / 16 non-causal")
    p.add_argument("--read_long_video", action="store_true")
    p.add_argument("--chunk_size", type=int, default=16)
    p.add_argument("--lpips_weights", type=str, default=None)
    p.add_argument("--bf16", action="store_true")
    return p


def main():
    args = get_parser().parse_args()
    import jax
    import jax.numpy as jnp

    from vidtok_tpu import load_model_from_config
    from vidtok_tpu.data.dataset import VidTokValDataset
    from vidtok_tpu.modules.lpips import LPIPS, load_lpips_params
    from vidtok_tpu.ops.metrics import compute_psnr, compute_ssim

    tok = load_model_from_config(
        args.config, ckpt=args.ckpt,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        init_shape=(1, 5, 64, 64))
    num_frames = args.num_frames or (17 if tok.is_causal else 16)

    if args.read_long_video:
        tok.use_tiling = True
        tok.t_chunk_enc = args.chunk_size
        tok.t_chunk_dec = args.chunk_size // tok.time_downsample_factor
        tok.use_overlap = True

    ds = VidTokValDataset(
        data_dir=args.data_dir, meta_path=args.meta_path,
        video_params=dict(input_height=args.input_height,
                          input_width=args.input_width,
                          sample_num_frames=num_frames,
                          sample_fps=args.sample_fps),
        pre_load_frames=False, read_long_video=args.read_long_video,
        chunk_size=args.chunk_size, is_causal=tok.is_causal)

    lp = load_lpips_params(args.lpips_weights) if args.lpips_weights else load_lpips_params()
    lpips = LPIPS() if lp is not None else None
    if lpips is not None:
        lpips_fn = jax.jit(lambda a, b: jnp.mean(
            lpips.apply({"params": lp}, a, b)))

    psnrs, ssims, lpipss = [], [], []
    for i in range(len(ds)):
        item = ds[i]
        x = jnp.asarray(item["jpg"][None]).transpose(0, 4, 1, 2, 3)
        _, xrec, _ = tok(x)
        a = (np.asarray(x) + 1) / 2
        b = (np.clip(np.asarray(xrec), -1, 1) + 1) / 2
        # 16-frame splits (reference inference_evaluate.py:183-186)
        t = a.shape[2]
        for s in range(0, t, 16):
            e = min(t, s + 16)
            av, bv = a[:, :, s:e], b[:, :, s:e]
            psnrs.append(float(compute_psnr(av, bv)))
            ssims.append(float(compute_ssim(av, bv)))
            if lpips is not None:
                af = np.transpose(av, (0, 2, 3, 4, 1)).reshape(-1, *av.shape[3:], 3)
                bf = np.transpose(bv, (0, 2, 3, 4, 1)).reshape(-1, *bv.shape[3:], 3)
                lpipss.append(float(lpips_fn(jnp.asarray(af * 2 - 1),
                                             jnp.asarray(bf * 2 - 1))))
        print(f"[{i+1}/{len(ds)}] {os.path.basename(item['path'])}  "
              f"psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.4f}")

    print(f"\nmean PSNR: {np.mean(psnrs):.4f}")
    print(f"mean SSIM: {np.mean(ssims):.4f}")
    if lpipss:
        print(f"mean LPIPS: {np.mean(lpipss):.4f}")
    else:
        print("LPIPS: skipped (no converted weights; see tools/convert_lpips.py)")


if __name__ == "__main__":
    main()
