"""Profiling / observability helpers (reference SURVEY §5.1: Lightning
simple profiler + CUDA max-memory report, main.py:775, 1116-1123)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock EMA step timer with throughput reporting."""

    def __init__(self, decay: float = 0.9):
        self.decay = decay
        self.ema = None
        self._t0 = None

    def tic(self):
        self._t0 = time.perf_counter()

    def toc(self) -> float:
        dt = time.perf_counter() - self._t0
        self.ema = dt if self.ema is None else (
            self.decay * self.ema + (1 - self.decay) * dt)
        return dt


def device_memory_report() -> dict:
    """Per-device memory stats (the reference prints
    torch.cuda.max_memory_allocated after training, main.py:1116-1123)."""
    import jax

    out = {}
    for d in jax.local_devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        out[str(d)] = {
            "bytes_in_use": stats.get("bytes_in_use"),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            "bytes_limit": stats.get("bytes_limit"),
        }
    return out


def param_memory_report(params, dtype_bytes: int = 4) -> str:
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    return (f"{n/1e6:.1f}M params, "
            f"{n*dtype_bytes/1e9:.2f} GB at {dtype_bytes}B/param "
            f"({n*2/1e9:.2f} GB bf16)")
