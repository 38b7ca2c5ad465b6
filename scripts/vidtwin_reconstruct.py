"""VidTwin reconstruction / cross-reenactment CLI (mirrors reference
vidtwin/scripts/inference_reconstruct.py and
inference_vidtwin_cross_reconstruct.py).

  python scripts/vidtwin_reconstruct.py --config configs/vidtwin/... \
      --ckpt model.npz --input_video_path a.mp4 \
      [--dynamics_video_path b.mp4]   # cross-reenactment: structure of A +
                                      # dynamics of B
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
    p.add_argument("--input_video_path", required=True)
    p.add_argument("--dynamics_video_path", default=None)
    p.add_argument("--sample_fps", type=int, default=8)
    p.add_argument("--output_video_dir", default="outputs")
    args = p.parse_args()

    import jax.numpy as jnp

    from vidtok_tpu.data.transforms import default_transform
    from vidtok_tpu.data.video_reader import read_frames_at, video_info, write_video
    from vidtok_tpu.models.vidtwin.engine import VidTwinTokenizer

    tok = VidTwinTokenizer.from_config(args.config, ckpt=args.ckpt)
    t, h, w = tok.model.encoder.input_size

    def load(path):
        total, fps = video_info(path)
        interval = max(1, round(fps / args.sample_fps))
        ids = list(range(0, total, interval))[:t]
        frames = read_frames_at(path, ids)
        frames = default_transform(frames, h, w)
        if frames.shape[0] < t:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], t - frames.shape[0], 0)], 0)
        return jnp.asarray(frames[None]).transpose(0, 4, 1, 2, 3)

    xa = load(args.input_video_path)
    if args.dynamics_video_path:
        xb = load(args.dynamics_video_path)
        xrec = tok.cross_reenact(xa, xb)
        tag = "cross"
    else:
        _, xrec, _ = tok(xa)
        tag = "recon"

    to_u8 = lambda a: ((np.clip(np.asarray(a), -1, 1) + 1) * 127.5).astype(np.uint8)  # noqa
    a = to_u8(xa)[0].transpose(1, 2, 3, 0)
    r = to_u8(xrec)[0].transpose(1, 2, 3, 0)
    side = np.concatenate([a, r], axis=2)
    os.makedirs(args.output_video_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.input_video_path))[0]
    out = os.path.join(args.output_video_dir, f"{name}_{tag}.mp4")
    write_video(out, side, fps=args.sample_fps)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
