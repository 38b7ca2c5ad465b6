"""Throughput at batch >1: amortizes per-call relay dispatch and probes
whether batch serving lifts frames/s/chip (BASELINE target is throughput —
5x realtime per chip — so the best-batch number is the honest headline).

  python tools/bench_batch.py [B ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vidtok_tpu import load_model_from_config

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    batches = [int(a) for a in sys.argv[1:]] or [1, 2, 4]
    tok = load_model_from_config(
        os.path.join(ROOT, "configs", "vidtok_kl_causal_488_16chn.yaml"),
        init_shape=(1, 5, 64, 64), compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 else p,
        tok.params)
    fn = tok._full_forward_fn(sample=False, fused=True)
    rng = jax.random.PRNGKey(0)
    T, H, W = 17, 256, 256

    @jax.jit
    def step(params, x, rng):
        z, dec, log = fn(params, x, rng)
        return jnp.sum(dec.astype(jnp.float32))

    for B in batches:
        x = jnp.asarray(np.random.RandomState(0)
                        .randn(B, 3, T, H, W).astype(np.float32) * 0.5)
        float(step(params, x, rng))  # compile+warm
        float(step(params, x, rng))
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(step(params, x, rng))  # scalar sync (axon relay)
            times.append(time.perf_counter() - t0)
        med = sorted(times)[len(times) // 2]
        fps = B * T / med
        print(f"B={B}: {med*1e3:7.1f} ms/call  {med*1e3/B:6.1f} ms/clip  "
              f"{fps:6.1f} frames/s/chip")


if __name__ == "__main__":
    main()
