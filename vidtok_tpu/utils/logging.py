"""Observability: scalar metrics (TensorBoard via clu, JSONL fallback) and
image/video logging (PNG grids + GIFs — reference
vidtok/modules/logger.py:23-289 equivalents)."""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricLogger:
    """TensorBoard (clu) + JSONL, with optional wandb when installed and
    configured (reference supports tensorboard/wandb/csv,
    main.py:802-855)."""

    def __init__(self, logdir: str, use_tensorboard: bool = True,
                 wandb_project: Optional[str] = None,
                 wandb_run_id: Optional[str] = None):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from clu import metric_writers

                self._tb = metric_writers.SummaryWriter(logdir)
            except Exception:
                self._tb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, dir=logdir,
                                         id=wandb_run_id,
                                         resume="allow" if wandb_run_id else None)
            except Exception:
                self._wandb = None
        self._jsonl = open(os.path.join(logdir, "metrics.jsonl"), "a")

    @property
    def wandb_run_id(self) -> Optional[str]:
        """Active wandb run id (persisted by the train CLI so --resume
        re-attaches; reference main.py:711-720)."""
        return getattr(self._wandb, "id", None) if self._wandb else None

    def log_scalars(self, step: int, scalars: Dict[str, float]):
        scalars = {k: float(v) for k, v in scalars.items()}
        if self._tb is not None:
            self._tb.write_scalars(step, scalars)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)
        self._jsonl.write(json.dumps({"step": step, "time": time.time(),
                                      **scalars}) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        self._jsonl.close()


def to_uint8(x: np.ndarray) -> np.ndarray:
    """[-1,1] float -> uint8."""
    return ((np.clip(x, -1, 1) + 1) * 127.5).astype(np.uint8)


def frame_grid(video: np.ndarray, n_cols: int = 8) -> np.ndarray:
    """[T,H,W,C] -> one PNG grid image (reference ImageLogger grids)."""
    t, h, w, c = video.shape
    n_cols = min(n_cols, t)
    n_rows = -(-t // n_cols)
    grid = np.zeros((n_rows * h, n_cols * w, c), video.dtype)
    for i in range(t):
        r, col = divmod(i, n_cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = video[i]
    return grid


class ImageVideoLogger:
    """Writes input/recon PNG grids and side-by-side GIFs every
    ``batch_frequency`` steps (reference logger.py:23-289)."""

    def __init__(self, logdir: str, batch_frequency: int = 5000,
                 max_samples: int = 2, disabled: bool = False,
                 increase_log_steps: bool = False, log_first_step: bool = False,
                 **_):
        self.dir = os.path.join(logdir, "images")
        os.makedirs(self.dir, exist_ok=True)
        self.freq = batch_frequency
        self.max_samples = max_samples
        self.disabled = disabled
        self.log_first_step = log_first_step
        # 2^n warmup schedule (reference ImageLogger, main.py:404)
        self.steps = set()
        if increase_log_steps:
            s = 1
            while s < batch_frequency:
                self.steps.add(s)
                s *= 2

    def should_log(self, step: int) -> bool:
        if self.disabled:
            return False
        if step == 0:
            return self.log_first_step
        return step % self.freq == 0 or step in self.steps

    def log(self, step: int, inputs: np.ndarray, recons: np.ndarray,
            split: str = "train"):
        """inputs/recons: [B,T,H,W,C] in [-1,1]."""
        if self.disabled:
            return
        import imageio

        n = min(self.max_samples, inputs.shape[0])
        for b in range(n):
            xin = to_uint8(inputs[b])
            xrec = to_uint8(recons[b])
            grid = np.concatenate([frame_grid(xin), frame_grid(xrec)], axis=0)
            imageio.imwrite(
                os.path.join(self.dir, f"{split}_gs{step:08d}_b{b}.png"), grid)
            side = np.concatenate([xin, xrec], axis=2)
            imageio.mimsave(
                os.path.join(self.dir, f"{split}_gs{step:08d}_b{b}.gif"),
                list(side), duration=0.125)
