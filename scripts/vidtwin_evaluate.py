"""VidTwin evaluation CLI — PSNR/SSIM over a directory of videos (mirrors
reference vidtwin/scripts/inference_evaluate.py).

  python scripts/vidtwin_evaluate.py --config configs/vidtwin/... \
      --ckpt model.npz --data_dir /path/to/videos
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--data_dir", required=True)
    p.add_argument("--meta_path", default=None)
    p.add_argument("--sample_fps", type=int, default=8)
    args = p.parse_args()

    import jax.numpy as jnp

    from vidtok_tpu.data.dataset import VidTokValDataset
    from vidtok_tpu.models.vidtwin.engine import VidTwinTokenizer
    from vidtok_tpu.ops.metrics import compute_psnr, compute_ssim

    tok = VidTwinTokenizer.from_config(args.config, ckpt=args.ckpt)
    t, h, w = tok.model.encoder.input_size

    ds = VidTokValDataset(
        data_dir=args.data_dir, meta_path=args.meta_path,
        video_params=dict(input_height=h, input_width=w,
                          sample_num_frames=t, sample_fps=args.sample_fps),
        pre_load_frames=False, is_causal=False)

    psnrs, ssims = [], []
    for i in range(len(ds)):
        item = ds[i]
        x = jnp.asarray(item["jpg"][None]).transpose(0, 4, 1, 2, 3)
        _, xrec, _ = tok(x)
        a = np.clip((np.asarray(x) + 1) / 2, 0, 1)
        b = np.clip((np.asarray(xrec) + 1) / 2, 0, 1)
        psnrs.append(float(compute_psnr(a, b)))
        ssims.append(float(compute_ssim(a, b)))
        print(f"[{i+1}/{len(ds)}] psnr={psnrs[-1]:.2f} ssim={ssims[-1]:.4f}")
    print(f"\nmean PSNR: {np.mean(psnrs):.4f}\nmean SSIM: {np.mean(ssims):.4f}")


if __name__ == "__main__":
    main()
