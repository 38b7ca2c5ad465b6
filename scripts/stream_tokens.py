"""Streaming tokenization demo: push a video through the chunked causal
encoder one chunk at a time (O(1) memory in video length) and emit FSQ
tokens / latents with per-chunk latency.

  python scripts/stream_tokens.py --config configs/v1_1/... [--ckpt ...] \
      --input_video_path video.mp4 [--chunk_size 16] [--out tokens.npz]

This is the serving-shaped entry point: the per-chunk compiled step is
reused for any video length with no recompilation, and the causal cache
pytree is the only carried state.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--input_video_path", required=True)
    p.add_argument("--input_height", type=int, default=256)
    p.add_argument("--input_width", type=int, default=256)
    p.add_argument("--sample_fps", type=int, default=30)
    p.add_argument("--chunk_size", type=int, default=16)
    p.add_argument("--out", default=None)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import jax.numpy as jnp

    from vidtok_tpu import load_model_from_config
    from vidtok_tpu.data.transforms import default_transform
    from vidtok_tpu.data.video_reader import read_frames_at, video_info

    tok = load_model_from_config(
        args.config, ckpt=args.ckpt, init_shape=(1, 5, 64, 64),
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if tok.meta.get("variant") != "causal_v1_1":
        raise SystemExit("streaming tokenization requires a v1.1 model")
    tok.use_tiling = True
    tok.t_chunk_enc = args.chunk_size
    tok.t_chunk_dec = args.chunk_size // tok.time_downsample_factor
    tok.use_overlap = True

    total, fps = video_info(args.input_video_path)
    interval = max(1, round(fps / args.sample_fps))
    ids = list(range(0, total, interval))
    cs = args.chunk_size
    ids = ids[: cs * ((len(ids) - 1) // cs) + 1]
    print(f"streaming {len(ids)} frames in chunks of {cs} "
          f"(+1 causal anchor frame)")

    schedule = tok.build_chunk_start_end(len(ids))
    cache = None
    first_fn = step_fn = None
    zs = []
    for i, (s, e) in enumerate(schedule):
        t0 = time.perf_counter()
        frames = read_frames_at(args.input_video_path, ids[s:e])
        frames = default_transform(frames, args.input_height, args.input_width)
        x = jnp.asarray(frames[None]).transpose(0, 4, 1, 2, 3)
        t_read = time.perf_counter() - t0

        t0 = time.perf_counter()
        if i == 0:
            first_fn, step_fn = tok._stream_encode_fns(
                (1, 3, cs, args.input_height, args.input_width), x.shape,
                False)
            z, log, cache = first_fn(tok.params, x, tok._next_rng())
        else:
            z, log, cache = step_fn(tok.params, cache, x, tok._next_rng())
        z = np.asarray(z)  # sync
        t_enc = time.perf_counter() - t0
        zs.append(z)
        extra = ""
        if tok.discrete:
            extra = f" tokens={np.asarray(log['indices']).size}"
        print(f"chunk {i:3d} [{s:4d}:{e:4d}]: read {t_read*1e3:6.1f} ms  "
              f"encode {t_enc*1e3:7.1f} ms  z{z.shape}{extra}")

    z_all = np.concatenate(zs, axis=1)           # [B, T', H', W', Cz]
    z_all = np.transpose(z_all, (0, 4, 1, 2, 3))  # NCTHW (engine layout)
    print(f"total latents (NCTHW): {z_all.shape}")
    if args.out:
        np.savez(args.out, z=z_all)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
