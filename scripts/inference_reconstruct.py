"""Reconstruct a video through a tokenizer and write input|recon side by side.

Mirrors reference scripts/inference_reconstruct.py (CLI flags and chunking
behavior) on the TPU-native engine.

  python scripts/inference_reconstruct.py --config configs/... \
      --ckpt model.npz --input_video_path video.mp4 \
      [--input_height 256 --input_width 256 --sample_fps 30]
      [--chunk_size 16] [--read_long_video] [--pad_gen_frames]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--input_video_path", type=str, required=True)
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=256)
    p.add_argument("--sample_fps", type=int, default=30)
    p.add_argument("--chunk_size", type=int, default=16,
                   help="frames per inference batch (+1 if causal)")
    p.add_argument("--read_long_video", action="store_true",
                   help="tiled streaming inference over the whole video")
    p.add_argument("--pad_gen_frames", action="store_true",
                   help="feed last generated frames back as context")
    p.add_argument("--output_video_dir", type=str, default="outputs")
    p.add_argument("--bf16", action="store_true")
    return p


def main():
    args = get_parser().parse_args()
    import jax.numpy as jnp

    from vidtok_tpu import load_model_from_config
    from vidtok_tpu.data.transforms import default_transform
    from vidtok_tpu.data.video_reader import (read_frames_at, video_info,
                                              write_video)

    tok = load_model_from_config(
        args.config, ckpt=args.ckpt,
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        init_shape=(1, 5, 64, 64))

    tdf = tok.time_downsample_factor
    assert args.chunk_size % tdf == 0, (
        f"chunk_size must be divisible by time_downsample_factor {tdf}")

    total, fps = video_info(args.input_video_path)
    interval = max(1, round(fps / args.sample_fps))
    frame_ids = list(range(0, total, interval))

    n_per = args.chunk_size + (1 if tok.is_causal else 0)
    if args.read_long_video:
        vl = len(frame_ids)
        cs = args.chunk_size
        if tok.is_causal:
            frame_ids = frame_ids[: cs * ((vl - 1) // cs) + 1]
        else:
            frame_ids = frame_ids[: cs * (vl // cs)]
        batches = [frame_ids]
        tok.use_tiling = True
        tok.t_chunk_enc = cs
        tok.t_chunk_dec = cs // tdf
        tok.use_overlap = True
    else:
        batches = [frame_ids[i : i + n_per]
                   for i in range(0, len(frame_ids), n_per)]
        batches = [b for b in batches if len(b) == n_per]

    frames = read_frames_at(args.input_video_path, frame_ids)
    frames = default_transform(frames, args.input_height, args.input_width)
    pos = {idx: i for i, idx in enumerate(frame_ids)}

    # pad_gen_frames (reference inference_reconstruct.py:213-219): prepend
    # the last tdf-1 GENERATED frames as causal context for the next batch,
    # keep only the last chunk-length outputs.
    outs, ins = [], []
    prev_gen = None
    pad_gen = (args.pad_gen_frames and tok.is_causal
               and not args.read_long_video)
    tic = time.time()
    for bi, ids in enumerate(batches):
        x = frames[[pos[i] for i in ids]]  # [T,H,W,C]
        if pad_gen and prev_gen is not None:
            model_in = np.concatenate([prev_gen, x], axis=0)
        else:
            model_in = x
        batch = jnp.asarray(model_in[None]).transpose(0, 4, 1, 2, 3)  # NCTHW
        _, xrec, _ = tok(batch)
        xrec = np.clip(np.asarray(xrec)[0].transpose(1, 2, 3, 0), -1, 1)
        xrec = xrec[-x.shape[0]:]
        if pad_gen:
            prev_gen = xrec[1 - tdf:] if tdf > 1 else xrec[:0]
        ins.append(x)
        outs.append(xrec)
    print(f"inference time: {time.time() - tic:.2f}s for "
          f"{sum(o.shape[0] for o in outs)} frames")

    x_all = np.concatenate(ins)
    r_all = np.concatenate(outs)
    to_u8 = lambda a: ((np.clip(a, -1, 1) + 1) * 127.5).astype(np.uint8)  # noqa
    side = np.concatenate([to_u8(x_all), to_u8(r_all)], axis=2)

    os.makedirs(args.output_video_dir, exist_ok=True)
    name = os.path.splitext(os.path.basename(args.input_video_path))[0]
    out_path = os.path.join(args.output_video_dir, f"{name}_recon.mp4")
    write_video(out_path, side, fps=args.sample_fps)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
