"""Datasets mirroring reference vidtok/data/vidtok.py.

* ``VidTokDataset`` (training, reference :18-128): CSV metadata with a
  ``videos`` column of paths relative to ``data_dir``; per-item fps-resampled
  read with random temporal crop (fixed when ``start_index`` given);
  resize/center-crop/normalize; missing-file resample fallback and
  black-frame fallback; tail padded by repeating the last frame.
* ``VidTokValDataset`` (eval, reference :131-333): enumerates every
  fixed-stride window of every video; ``read_long_video`` truncates to
  chunk-aligned lengths; optional full pre-load into host RAM.

Items are ``{'jpg': float32 [T,H,W,C] in [-1,1], 'path': str}`` —
channels-last (the reference returns [C,T,H,W]; our engine/trainer consume
NTHWC natively).
"""

from __future__ import annotations

import glob
import os
import random
from typing import Optional, Union

import numpy as np

from .transforms import default_transform
from .video_reader import (read_frames_at, read_video_frames, video_info)


def _read_meta(meta_path: str):
    import pandas as pd

    meta = pd.read_csv(meta_path, on_bad_lines="skip", encoding="ISO-8859-1",
                       engine="python", sep=",")
    meta = meta.dropna()
    return meta


class VidTokDataset:
    def __init__(self, data_dir: str, meta_path: str, video_params: dict,
                 data_frac: float = 1.0, is_strict_loading: bool = False,
                 skip_missing_files: bool = True,
                 start_index: Optional[int] = None, seed: Optional[int] = None):
        self.data_dir = data_dir
        self.video_params = video_params
        self.is_strict_loading = is_strict_loading
        self.skip_missing_files = skip_missing_files
        self.start_index = start_index
        self.rng = random.Random(seed)
        meta = _read_meta(meta_path)
        if data_frac < 1:
            meta = meta.sample(frac=data_frac)
        self.paths = [os.path.join(data_dir, str(v)) for v in meta["videos"]]
        self.missing_files = []

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, item):
        vp = self.video_params
        path = self.paths[item % len(self.paths)]
        try:
            if os.path.isfile(path):
                frames, _ = read_video_frames(
                    path, vp["sample_num_frames"], vp["sample_fps"],
                    self.start_index, rng=self.rng)
            else:
                if path not in self.missing_files:
                    self.missing_files.append(path)
                if self.skip_missing_files:
                    return self[self.rng.randrange(len(self))]
                raise ValueError(f"missing video {path}")
        except ValueError:
            raise
        except Exception:
            if self.is_strict_loading:
                raise
            frames = np.zeros((1, vp["input_height"], vp["input_width"], 3),
                              np.float32)

        frames = default_transform(frames, vp["input_height"],
                                   vp["input_width"])
        n = vp["sample_num_frames"]
        if frames.shape[0] < n:
            tail = np.repeat(frames[-1:], n - frames.shape[0], axis=0)
            frames = np.concatenate([frames, tail], axis=0)
        return {"jpg": frames.astype(np.float32), "path": path}


class VidTokValDataset:
    def __init__(self, data_dir: str, video_params: dict,
                 meta_path: Optional[str] = None,
                 pre_load_frames: bool = True, is_strict_loading: bool = True,
                 last_frames_handle: str = "repeat",
                 skip_missing_files: bool = False,
                 read_long_video: bool = False, chunk_size: int = 16,
                 is_causal: bool = True):
        self.data_dir = data_dir
        self.video_params = video_params
        self.read_long_video = read_long_video
        self.chunk_size = chunk_size
        self.is_causal = is_causal
        self.is_strict_loading = is_strict_loading
        self.last_frames_handle = last_frames_handle
        self.skip_missing_files = skip_missing_files

        if meta_path is not None:
            meta = _read_meta(meta_path)
            paths = [os.path.join(data_dir, str(v)) for v in meta["videos"]]
        else:
            paths = sorted(glob.glob(os.path.join(data_dir, "**", "*.mp4"),
                                     recursive=True))
        self.frames_batch = []
        self._enumerate_windows(paths)
        if pre_load_frames:
            self._pre_load()

    def _enumerate_windows(self, paths):
        """Fixed-stride windows per video (reference vidtok.py:204-254)."""
        vp = self.video_params
        for path in paths:
            if not os.path.isfile(path):
                continue
            total, fps = video_info(path)
            interval = round(fps / vp["sample_fps"])
            frame_ids = list(range(0, total, max(1, interval)))
            if self.read_long_video:
                vl = len(frame_ids)
                cs = self.chunk_size
                if self.is_causal and vl > cs:
                    ids = frame_ids[: cs * ((vl - 1) // cs) + 1]
                elif not self.is_causal and vl >= cs:
                    ids = frame_ids[: cs * (vl // cs)]
                else:
                    continue
                self.frames_batch.append({"video_fp": path,
                                          "num_frames_ids": ids})
            else:
                n = vp["sample_num_frames"]
                for x in range(0, len(frame_ids), n):
                    ids = frame_ids[x : x + n]
                    if len(ids) < n:
                        if self.last_frames_handle == "repeat":
                            ids = ids + [ids[-1]] * (n - len(ids))
                        elif self.last_frames_handle == "drop":
                            continue
                        else:
                            raise ValueError(self.last_frames_handle)
                    self.frames_batch.append({"video_fp": path,
                                              "num_frames_ids": ids})

    def _pre_load(self):
        for item in self.frames_batch:
            item["frames"] = read_frames_at(item["video_fp"],
                                            item["num_frames_ids"])

    def __len__(self):
        return len(self.frames_batch)

    def __getitem__(self, item):
        vp = self.video_params
        entry = self.frames_batch[item]
        if "frames" in entry:
            frames = entry["frames"]
        else:
            frames = read_frames_at(entry["video_fp"],
                                    entry["num_frames_ids"])
        frames = default_transform(frames, vp["input_height"],
                                   vp["input_width"])
        if not self.read_long_video:
            n = vp["sample_num_frames"]
            if frames.shape[0] < n:
                tail = np.repeat(frames[-1:], n - frames.shape[0], axis=0)
                frames = np.concatenate([frames, tail], axis=0)
        return {"jpg": frames.astype(np.float32), "path": entry["video_fp"]}
