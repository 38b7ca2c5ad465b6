"""Sustained-throughput probe: N async step launches, one trailing sync.

Per-call scalar syncs charge the axon relay's ~30-60 ms dispatch latency to
every step; a serving system overlaps host dispatch with device execution.
This measures steady-state frames/s with dispatch pipelined (depth-D window:
sync step i-D when launching step i, so the host never runs unboundedly
ahead), at the given batch sizes.

  python tools/bench_pipeline.py [B ...]
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
    batches = [int(a) for a in sys.argv[1:]] or [1, 4]
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
        iters, depth = 12, 2
        pending = []
        t0 = time.perf_counter()
        for i in range(iters):
            pending.append(step(params, x, rng))
            if len(pending) > depth:
                float(pending.pop(0))  # sync the oldest launch
        for p in pending:
            float(p)
        wall = time.perf_counter() - t0
        per = wall / iters
        print(f"B={B} pipelined(depth={depth}): {per*1e3:7.1f} ms/call  "
              f"{per*1e3/B:6.1f} ms/clip  {B*T/per:6.1f} frames/s/chip")


if __name__ == "__main__":
    main()
