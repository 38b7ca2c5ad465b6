"""Probe: does the persistent compilation cache work through the axon relay?

Times trace/compile/execute separately and logs persistent-cache activity.
Run twice in separate processes: the second run's compile phase should be
near-instant if the disk cache is hit.

Usage: python tools/probe_compile_cache.py
"""

import logging
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from vidtok_tpu.utils.compile_cache import enable_persistent_cache

cache_dir = enable_persistent_cache()
print("cache dir:", cache_dir, flush=True)

logging.basicConfig(level=logging.WARNING)
for name in ("jax._src.compilation_cache", "jax._src.compiler",
             "jax._src.cache_key"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), flush=True)


def f(x, w):
    for _ in range(4):
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.silu(x)
    return jnp.sum(x)


rs = np.random.RandomState(0)
x = jnp.asarray(rs.randn(2, 64, 64, 64).astype(np.float32))
w = jnp.asarray(rs.randn(3, 3, 64, 64).astype(np.float32) * 0.05)

t0 = time.perf_counter()
lowered = jax.jit(f).lower(x, w)
t1 = time.perf_counter()
compiled = lowered.compile()
t2 = time.perf_counter()
v = float(compiled(x, w))
t3 = time.perf_counter()
print(f"trace/lower {t1-t0:.2f}s  compile {t2-t1:.2f}s  "
      f"first-exec {t3-t2:.2f}s  value={v:.3e}", flush=True)

n = sum(len(files) for _, _, files in os.walk(cache_dir))
print(f"cache entries on disk: {n}", flush=True)
